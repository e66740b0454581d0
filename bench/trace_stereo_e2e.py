"""Device-trace the e2e packed stereo serving program (config-5 shape)
and print the per-op device-time breakdown.

Motivation (round-3 continuation): the isolated per-stage splits at b16
sum to ~13.3 ms (tower 6.37 + Gram 2.77 + packed agg 3.14 + preprocess
0.38 + soft-argmin 0.36 + up4x 0.27 — bench/profile_packed_stereo.py)
while the e2e program measures ~17.9 ms/iter (896 fps/chip) — ~4.6 ms
(26%) unaccounted. This probe attributes it at the fusion level.

Usage: python -u bench/trace_stereo_e2e.py [batch] [steps]
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

from scenedepthestimation_tpu.api import build_stereo_program, load_weights
from scenedepthestimation_tpu.configs import get


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = get("stereo_kitti2015_b16_bf16_v5e8")
    h, w = cfg.stereo.height, cfg.stereo.width
    predictor = load_weights(None, cfg, seed=0)
    program = jax.jit(build_stereo_program(cfg, predictor.model))

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))

    out = program(predictor.variables, left, right)
    jax.block_until_ready(out)

    logdir = "/tmp/tb_stereo_e2e"
    with jax.profiler.trace(logdir):
        for i in range(steps):
            out = program(
                predictor.variables, left + np.uint8(i), right + np.uint8(i)
            )
        jax.block_until_ready(out)

    files = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    print("xplane files:", files[-1:], flush=True)
    if not files:
        return
    pd = jax.profiler.ProfileData.from_file(files[-1])
    per_op = collections.Counter()
    nplanes = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        nplanes += 1
        for line in plane.lines:
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    total = sum(per_op.values())
    print(f"TPU planes: {nplanes}")
    print(f"total device event time: {total / 1e6:.2f} ms ({steps} steps) "
          f"-> {total / 1e6 / steps:.2f} ms/step")
    for name, dur in per_op.most_common(60):
        print(f"  {dur / 1e6 / steps:9.3f} ms/step  {name[:120]}")


if __name__ == "__main__":
    main()
