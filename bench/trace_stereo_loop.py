"""Device-trace the fori_loop-amortized config-5 stereo bench program —
the exact program behind the recorded 896 fps/chip — and print per-op
device time inside the hot loop.

Complements bench/trace_stereo_e2e.py (single-dispatch trace): here the
output relayouts and weight staging are amortized/elided exactly as in
benchmark.run_bench, so what remains IS the recorded per-iteration cost.

Usage: python -u bench/trace_stereo_loop.py [batch] [iters]
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

from scenedepthestimation_tpu.api import build_stereo_program, load_weights
from scenedepthestimation_tpu.configs import get


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = get("stereo_kitti2015_b16_bf16_v5e8")
    h, w = cfg.stereo.height, cfg.stereo.width
    predictor = load_weights(None, cfg, seed=0)
    program = build_stereo_program(cfg, predictor.model)

    @jax.jit
    def timed(variables, left, right, n):
        def body(i, acc):
            xl = left + i.astype(jnp.uint8)
            xr = right + i.astype(jnp.uint8)
            return acc + program(variables, xl, xr)["depth"].mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))

    float(timed(predictor.variables, left, right, 2))  # compile + warm

    logdir = "/tmp/tb_stereo_loop"
    with jax.profiler.trace(logdir):
        float(timed(predictor.variables, left, right, iters))

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
    # The top-level jit event double-counts its children; drop it.
    top = [k for k in per_op if k.startswith("jit_timed")]
    for k in top:
        print(f"top-level {k}: {per_op.pop(k) / 1e6:.2f} ms total")
    total = sum(per_op.values())
    print(f"device event time: {total / 1e6:.2f} ms ({iters} iters) "
          f"-> {total / 1e6 / iters:.3f} ms/iter "
          f"-> {1000.0 * b * iters / (total / 1e6):.1f} fps-equiv")
    for name, dur in per_op.most_common(50):
        print(f"  {dur / 1e6 / iters:9.3f} ms/iter  {name[:120]}")


if __name__ == "__main__":
    main()
