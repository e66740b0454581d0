"""Stage timing of the PACKED stereo serving path across batch sizes
(VERDICT r2 weak-#2 / next-#3: where does the b2 fixed overhead live?).

Times each stage of api.build_stereo_program's packed branch in
isolation (perturbed-operand fori_loop harness — see BASELINE.md
hoisting lesson), at the config-5 shape, for each batch on argv.

Usage: python -u bench/profile_packed_stereo.py [b,b,...] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.api import load_weights
from scenedepthestimation_tpu.configs import get
from scenedepthestimation_tpu.models.stereo import FeatureTower
from scenedepthestimation_tpu.ops.collapsed import collapsed_cost_aggregation
from scenedepthestimation_tpu.ops.correlation import correlation1d
from scenedepthestimation_tpu.ops.preprocess import preprocess
from scenedepthestimation_tpu.ops.soft_argmin import soft_argmin
from scenedepthestimation_tpu.ops.upsample import upsample4x_bilinear_packed


def timeit(fn, args, iters=16, warmup=2):
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
            return acc + jnp.asarray(y).mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def main():
    batches = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [2, 16]
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = get("stereo_kitti2015_b16_bf16_v5e8")
    s = cfg.stereo
    dtype = jnp.bfloat16
    h, w, d = s.height, s.width, s.corr_disp
    h4, w4 = h // 4, w // 4
    predictor = load_weights(None, cfg, seed=0)
    params = predictor.variables["params"]
    tower = FeatureTower(channels=s.feat_channels, dtype=dtype, name="tower")

    for b in batches:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        raw = jax.random.randint(ks[0], (b, h, w, 3), 0, 255, jnp.int32).astype(
            jnp.float32
        )
        pair = jax.random.normal(ks[1], (2 * b, h, w, 3), dtype)
        fl = jax.random.normal(ks[2], (b, h4, w4, s.feat_channels), dtype)
        fr = jax.random.normal(ks[3], (b, h4, w4, s.feat_channels), dtype)
        agg_in = jax.random.normal(
            ks[4], (b, h4, w4, d + s.feat_channels), dtype
        )
        cost = jax.random.normal(ks[5], (b, h4, w4, d), jnp.float32)
        q4 = jax.random.normal(ks[6], (b, h4, w4, 1), jnp.float32)
        jax.block_until_ready((raw, pair, fl, fr, agg_in, cost, q4))

        cases = [
            ("preprocess x2", lambda x: preprocess(x, (h, w), cfg.pre,
                                                   compute_dtype=dtype), raw),
            ("tower (2B)  ", lambda x: tower.apply(
                {"params": params["tower"]}, x), pair),
            ("correlation ", lambda x: correlation1d(x, fr, d), fl),
            ("packed agg  ", lambda x: collapsed_cost_aggregation(
                params["aggregation"], x, dtype=dtype), agg_in),
            ("soft-argmin ", lambda x: soft_argmin(x, temperature=1.0), cost),
            ("up4x packed ", lambda x: upsample4x_bilinear_packed(x), q4),
        ]
        total = 0.0
        print(f"--- b={b} (per-stage, isolated) ---", flush=True)
        for label, fn, arg in cases:
            ms = timeit(loop(fn), (arg,), iters) * 1e3
            total += ms if label != "preprocess x2" else 2 * ms
            extra = " (x2 views)" if label == "preprocess x2" else ""
            print(f"  {label}: {ms:7.3f} ms{extra}", flush=True)
        print(f"  sum={total:7.3f} ms -> {1000.0 * b / total:7.1f} fps-equiv",
              flush=True)


if __name__ == "__main__":
    main()
