"""Find where batch-minor layouts originate in the temporal step HLO.

Dumps the optimized HLO of the real temporal train step, then lists
every instruction producing a big f32 array whose layout puts dim 0 (B)
minor-most, grouped by source location — the op that DEMANDS the layout
is upstream of the copies that spread it.

Usage: python -u bench/hlo_layout_hunt.py [batch]
"""

from __future__ import annotations

import collections
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from scenedepthestimation_tpu import train as T
from scenedepthestimation_tpu.configs import get as get_cfg


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = get_cfg("mono_kitti_192x640_fp32")
    h, w = cfg.height, cfg.width
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(b, 3, h, w, 3), dtype=np.uint8))
    k_mat = jnp.asarray(np.broadcast_to(
        np.array([[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h],
                  [0, 0, 1]], np.float32), (b, 3, 3)))
    state = T.make_temporal_train_state(cfg, seed=0)
    step = T.make_mono_temporal_train_step(cfg)
    txt = (jax.jit(step)
           .lower(state, {"frames": frames, "K": k_mat})
           .compile().as_text())
    pathlib.Path("/tmp/hlo_step.txt").write_text(txt)
    print(f"dumped {len(txt)} bytes to /tmp/hlo_step.txt", flush=True)

    # big f32/bf16 arrays with dim0 minor-most (B in lanes)
    pat = re.compile(
        r"%(\S+) = (f32|bf16)\[(8[,\]][^\]]*)\]\{0[,:]")
    bad = collections.Counter()
    first = {}
    for line in txt.splitlines():
        m = pat.search(line)
        if not m:
            continue
        shape = m.group(3)
        # only big arrays (>= ~1 MB)
        dims = [int(x) for x in ("8," + shape).rstrip("]").split(",")[1:]
                if x.strip().isdigit()]
        size = 8
        for d in dims:
            size *= d
        if size < 200_000:
            continue
        sm = re.search(r'op_name="([^"]*)"', line)
        sf = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
        om = re.search(r"= \S+\[[^\]]*\]\S* ([a-z0-9._-]+)\(", line)
        key = (om.group(1) if om else "?",
               (sf.group(1).split("/")[-1] + ":" + sf.group(2)) if sf else "?",
               (sm.group(1)[:60] if sm else "?"))
        bad[key] += 1
        if key not in first:
            first[key] = line.strip()[:220]
    print(f"\n{sum(bad.values())} big B-minor-producing instructions; "
          f"by (op, src, name):")
    for key, n in bad.most_common(40):
        print(f"  {n:4d}  {key[0]:16s} {key[1]:28s} {key[2]}")


if __name__ == "__main__":
    main()
