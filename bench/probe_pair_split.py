"""A/B the pair-split formulation in the packed stereo serving path.

The round-3 loop trace (bench/trace_stereo_loop.py) attributed 2.56
ms/iter at config-5 b16 (15% of the iteration) to the reshape+index
split of the interleaved tower output: a rank-5 split fusion in a
T(2,128) layout plus three relayout copies feeding the correlation and
the agg concat. This probe measures e2e fps for each split variant in
one process, same harness as benchmark.run_bench.

Usage: python -u bench/probe_pair_split.py [b,b,...] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scenedepthestimation_tpu import api
from scenedepthestimation_tpu.configs import get


def fps(cfg, b, iters):
    predictor = api.load_weights(None, cfg, seed=0)
    program = api.build_stereo_program(cfg, predictor.model)
    h, w = cfg.stereo.height, cfg.stereo.width
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8))

    @jax.jit
    def timed(variables, left, right, n):
        def body(i, acc):
            xl = left + i.astype(jnp.uint8)
            xr = right + i.astype(jnp.uint8)
            return acc + program(variables, xl, xr)["depth"].mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(timed(predictor.variables, left, right, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(predictor.variables, left, right, iters))
        best.append(time.perf_counter() - t0)
    return b * iters / sorted(best)[1]


def main():
    batches = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [2, 16]
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cfg = get("stereo_kitti2015_b16_bf16_v5e8")
    for b in batches:
        for mode in ("reshape", "strided"):
            api.set_pair_split(mode)
            r = fps(cfg, b, iters)
            print(f"b={b:3d} split={mode:8s}: {r:8.1f} fps/chip", flush=True)
    api.set_pair_split("strided")


if __name__ == "__main__":
    main()
