#!/usr/bin/env python
"""Per-kernel benchmark: Pallas kernels vs their XLA (jnp-oracle)
lowerings on the real chip (SURVEY §5.1; decision data for the dispatch
flags in ops/*.py). Prints one JSON line per kernel.

Usage: python bench/kernels.py [--shape B H W C D]
"""

import argparse
import json

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--shape", nargs=5, type=int, default=[16, 96, 288, 64, 48],
        metavar=("B", "H", "W", "C", "D"),
        help="feature-map shape at correlation resolution (config-5 default)",
    )
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    b, h, w, c, d = args.shape

    import jax.numpy as jnp

    from scenedepthestimation_tpu.ops.correlation import _correlation_jnp
    from scenedepthestimation_tpu.ops.pallas.correlation import correlation_pallas
    from scenedepthestimation_tpu.ops.pallas.soft_argmin import soft_argmin_pallas
    from scenedepthestimation_tpu.ops.pallas.upsample_concat import (
        upsample_concat_pallas,
    )
    from scenedepthestimation_tpu.ops.soft_argmin import _soft_argmin_jnp
    from scenedepthestimation_tpu.ops.upsample import upsample_concat
    from scenedepthestimation_tpu.utils.profiling import timed

    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    cost = jnp.asarray(rng.normal(size=(b, h, w, d)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    skip = jnp.asarray(
        rng.normal(size=(b, 2 * h, 2 * w, c // 2)).astype(np.float32)
    )

    rows = []
    rows.append(
        {
            "kernel": "correlation1d",
            "xla_ms": timed(lambda a, bb: _correlation_jnp(a, bb, d), fl, fr, iters=args.iters),
            "pallas_ms": timed(lambda a, bb: correlation_pallas(a, bb, d), fl, fr, iters=args.iters),
            "max_diff": float(
                jnp.max(
                    jnp.abs(
                        correlation_pallas(fl, fr, d) - _correlation_jnp(fl, fr, d)
                    )
                )
            ),
        }
    )
    rows.append(
        {
            "kernel": "soft_argmin",
            "xla_ms": timed(_soft_argmin_jnp, cost, iters=args.iters),
            "pallas_ms": timed(soft_argmin_pallas, cost, iters=args.iters),
            "max_diff": float(
                jnp.max(jnp.abs(soft_argmin_pallas(cost) - _soft_argmin_jnp(cost)))
            ),
        }
    )
    rows.append(
        {
            "kernel": "upsample_concat",
            "xla_ms": timed(upsample_concat, x, skip, iters=args.iters),
            "pallas_ms": timed(upsample_concat_pallas, x, skip, iters=args.iters),
            "max_diff": float(
                jnp.max(
                    jnp.abs(upsample_concat_pallas(x, skip) - upsample_concat(x, skip))
                )
            ),
        }
    )
    for r in rows:
        r["xla_ms"] = round(r["xla_ms"], 3)
        r["pallas_ms"] = round(r["pallas_ms"], 3)
        r["speedup"] = round(r["xla_ms"] / r["pallas_ms"], 2)
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
