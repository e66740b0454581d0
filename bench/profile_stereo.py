"""Per-stage timing of the stereo pipeline at the config-5 shape
(b16 bf16 384x1152, D=48 at /4): tower, correlation, aggregation
(encoder/decoder split), cost head, soft-argmin, final upsample.

All timed fns consume the perturbed operand (see the dispconv-hoisting
lesson in BASELINE.md).

Usage: python -u bench/profile_stereo.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.configs import StereoConfig
from scenedepthestimation_tpu.models.stereo import CostAggregation, FeatureTower
from scenedepthestimation_tpu.ops.correlation import correlation1d
from scenedepthestimation_tpu.ops.soft_argmin import soft_argmin
from scenedepthestimation_tpu.ops.upsample import upsample2x


def timeit(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def loop(fn):
    @jax.jit
    def t(x, n):
        def body(i, acc):
            y = fn(x + (i.astype(jnp.float32) * 1e-6).astype(x.dtype))
            return acc + y.mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = StereoConfig(height=384, width=1152)
    dtype = jnp.bfloat16
    h, w = cfg.height, cfg.width
    h4, w4 = h // 4, w // 4
    d = cfg.corr_disp
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    pair = jax.random.normal(ks[0], (2 * b, h, w, 3), dtype)
    feats = jax.random.normal(ks[1], (b, h4, w4, cfg.feat_channels), dtype)
    fr = jax.random.normal(ks[2], (b, h4, w4, cfg.feat_channels), dtype)
    agg_in = jax.random.normal(ks[3], (b, h4, w4, d + cfg.feat_channels), dtype)
    cost = jax.random.normal(ks[4], (b, h4, w4, d), jnp.float32)
    jax.block_until_ready((pair, feats, fr, agg_in, cost))
    print("staged", flush=True)

    tower = FeatureTower(channels=cfg.feat_channels, dtype=dtype)
    tvars = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    agg = CostAggregation(out_disp=d, channels=cfg.agg_channels, dtype=dtype)
    avars = agg.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 32, d + cfg.feat_channels),
                                          jnp.float32)
    )

    cases = [
        ("tower (2B views)       ", lambda x: tower.apply(tvars, x), pair),
        ("correlation1d (pallas) ", lambda x: correlation1d(x, fr, d), feats),
        ("aggregation U-Net      ", lambda x: agg.apply(avars, x), agg_in),
        ("soft-argmin fp32       ",
         lambda x: soft_argmin(x, temperature=1.0), cost),
        ("bilinear up x4 (b,h4)  ",
         lambda x: upsample2x(
             upsample2x(x[..., :1], mode="bilinear"), mode="bilinear"),
         feats),
    ]
    for label, fn, arg in cases:
        ms = timeit(loop(fn), (arg,), iters) * 1e3
        print(f"{label}: {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
