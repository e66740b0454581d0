"""HLO health check of the judged inference program.

Dumps the optimized HLO of the e2e mono forward (the program bench.py
times) and histograms the suspect op classes that caused the temporal
train-step pathology: big-array copies (layout churn), gathers /
scatters, reduce-windows, and big buffers with a minor-most batch dim.
Also prints total transpose/copy byte traffic as a share of all
buffer bytes, to bound what layout churn could possibly be worth.

Usage: python -u bench/hlo_health_infer.py [config] [batch]
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

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import (
    build_mono_program,
    build_stereo_program,
    load_weights,
)


def buf_bytes(shape: str, dtype: str) -> int:
    dims = [int(x) for x in shape.split(",") if x.strip().isdigit()]
    n = 1
    for d in dims:
        n *= d
    return n * {"f32": 4, "bf16": 2, "u8": 1, "s32": 4, "pred": 1}.get(
        dtype, 4
    )


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "mono_kitti_384x1152_bench"
    cfg = configs.get(name)
    if len(sys.argv) > 2:
        import dataclasses

        cfg = dataclasses.replace(cfg, batch_size=int(sys.argv[2]))
    b = cfg.batch_size
    predictor = load_weights(None, cfg, seed=0)
    rng = np.random.default_rng(0)
    shape = (b, cfg.height, cfg.width, 3)
    img = jnp.asarray(rng.integers(0, 256, size=shape, dtype=np.uint8))
    if cfg.pipeline == "mono":
        program = build_mono_program(cfg, predictor.model)
        fn = lambda v, x: program(v, x)["depth"]
        args = (predictor.variables, img)
    else:
        program = build_stereo_program(cfg, predictor.model)
        fn = lambda v, l, r: program(v, l, r)["disparity"]
        args = (predictor.variables, img, img)

    txt = jax.jit(fn).lower(*args).compile().as_text()
    out = pathlib.Path("/tmp/hlo_infer.txt")
    out.write_text(txt)
    print(f"dumped {len(txt)} bytes to {out}", flush=True)

    line_re = re.compile(
        r"= (f32|bf16|u8|s32|pred)\[([0-9,]*)\]"
        r"(\{[0-9,]+[^}]*\})? ([a-z0-9._-]+)\("
    )
    classes = collections.Counter()
    class_bytes = collections.Counter()
    suspects = collections.Counter()
    total_bytes = 0
    for line in txt.splitlines():
        m = line_re.search(line)
        if not m:
            continue
        dtype, shape_s, layout, op = m.groups()
        nb = buf_bytes(shape_s, dtype)
        total_bytes += nb
        classes[op] += 1
        class_bytes[op] += nb
        if op in ("copy", "transpose", "gather", "scatter",
                  "reduce-window", "dynamic-slice", "dynamic-update-slice"):
            if nb >= 1_000_000:
                sf = re.search(r'source_file="([^"]*)".*?source_line=(\d+)',
                               line)
                src = (sf.group(1).split("/")[-1] + ":" + sf.group(2)
                       ) if sf else "?"
                suspects[(op, dtype + "[" + shape_s + "]", src)] += 1
        # minor-most dim0 on a big multi-dim buffer
        if layout and nb >= 1_000_000 and layout.startswith("{0,") and \
                "," in shape_s:
            sf = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
            src = (sf.group(1).split("/")[-1] + ":" + sf.group(2)
                   ) if sf else "?"
            suspects[("DIM0-MINOR " + op, dtype + "[" + shape_s + "]",
                      src)] += 1

    print("\nop-class byte shares (top 15):")
    for op, nb in class_bytes.most_common(15):
        print(f"  {op:24s} n={classes[op]:4d}  {nb/1e6:9.1f} MB "
              f"({100.0*nb/max(total_bytes,1):4.1f}%)")
    print(f"\ntotal produced-buffer bytes: {total_bytes/1e6:.1f} MB")
    print("\nbig suspect instructions:")
    for key, n in suspects.most_common(40):
        print(f"  {n:3d}  {key[0]:28s} {key[1]:32s} {key[2]}")


if __name__ == "__main__":
    main()
