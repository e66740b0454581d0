"""Device-trace the embedded temporal train grad and print top ops.

Captures a jax.profiler trace of the full embedded grad (the 470 ms/b8
program) and aggregates per-op device time from the xplane via
jax.profiler.ProfileData.

Usage: python -u bench/trace_temporal.py [batch]
"""

from __future__ import annotations

import collections
import glob
import pathlib
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
    step = jax.jit(T.make_mono_temporal_train_step(cfg))

    # warm up / compile outside the trace
    st, m = step(state, {"frames": frames, "K": k_mat})
    jax.block_until_ready(m["loss"])

    logdir = "/tmp/tb_temporal"
    with jax.profiler.trace(logdir):
        for i in range(3):
            st, m = step(st, {"frames": frames + np.uint8(i), "K": k_mat})
        jax.block_until_ready(m["loss"])

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", files, flush=True)
    if not files:
        return
    pd = jax.profiler.ProfileData.from_file(files[-1])
    per_op = collections.Counter()
    per_cat = collections.Counter()
    nplanes = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        nplanes += 1
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                per_op[name] += dur
    print(f"TPU planes: {nplanes}")
    total = sum(per_op.values())
    print(f"total device event time: {total/1e6:.1f} ms (3 steps)")
    for name, dur in per_op.most_common(45):
        print(f"  {dur/1e6:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
