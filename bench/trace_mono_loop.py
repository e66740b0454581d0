"""Device-trace the fori-amortized judged mono bench program (b128 bf16
384x1152) and print per-op device time — what exactly the 1682 fps
iteration spends, at the fusion level.

Usage: python -u bench/trace_mono_loop.py [batch] [iters]
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
from jax import lax

from scenedepthestimation_tpu.api import build_mono_program, load_weights
from scenedepthestimation_tpu.configs import get


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = get("mono_kitti_384x1152_bench")
    h, w = cfg.mono.height, cfg.mono.width
    predictor = load_weights(None, cfg, seed=0)
    program = build_mono_program(cfg, predictor.model)

    @jax.jit
    def timed(variables, img, n):
        def body(i, acc):
            x = img + i.astype(jnp.uint8)
            return acc + program(variables, x)["depth"].mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))
    float(timed(predictor.variables, img, 2))

    logdir = "/tmp/tb_mono_loop"
    with jax.profiler.trace(logdir):
        float(timed(predictor.variables, img, iters))

    files = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not files:
        print("no xplane captured")
        return
    pd = jax.profiler.ProfileData.from_file(files[-1])
    per_op = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    for k in [k for k in per_op if k.startswith("jit_timed")]:
        print(f"top-level {k}: {per_op.pop(k) / 1e6:.2f} ms total")
    total = sum(per_op.values())
    print(f"device event time: {total / 1e6:.2f} ms ({iters} iters)")
    for name, dur in per_op.most_common(45):
        print(f"  {dur / 1e6 / iters:9.3f} ms/iter  {name[:130]}")


if __name__ == "__main__":
    main()
