"""Per-conv timing of the stereo FeatureTower (the largest config-5
stage: 6.37 ms isolated at b16 = ~13.5 TF/s effective for ~86 GFLOP —
4x under the ~60 TF/s isolated-conv floor; BASELINE.md round-3 stage
splits). Locates which conv is pathological before any rewrite.

Usage: python -u bench/profile_tower.py [b_pairs,...] [iters]
(b_pairs = stereo batch; the tower runs 2x that.)
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


def conv_relu(x, k, stride):
    y = lax.conv_general_dilated(
        x,
        k,
        (stride, stride),
        ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jnp.maximum(y, 0)


def main():
    batches = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [16]
    )
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    cfg = get("stereo_kitti2015_b16_bf16_v5e8")
    s = cfg.stereo
    dtype = jnp.bfloat16
    h, w, c = s.height, s.width, s.feat_channels
    predictor = load_weights(None, cfg, seed=0)
    params = predictor.variables["params"]["tower"]
    tower = FeatureTower(channels=c, dtype=dtype, name="tower")

    k1 = params["down1"]["conv"]["kernel"].astype(dtype)  # (5,5,3,32)
    b1 = params["down1"]["conv"]["bias"].astype(dtype)
    k2 = params["down2"]["conv"]["kernel"].astype(dtype)  # (5,5,32,C)
    b2 = params["down2"]["conv"]["bias"].astype(dtype)
    k3 = params["refine1"]["conv"]["kernel"].astype(dtype)
    b3 = params["refine1"]["conv"]["bias"].astype(dtype)
    k4 = params["refine2"]["conv"]["kernel"].astype(dtype)
    b4 = params["refine2"]["conv"]["bias"].astype(dtype)

    for bp in batches:
        n = 2 * bp
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (n, h, w, 3), dtype)
        x1 = jax.random.normal(key, (n, h // 2, w // 2, 32), dtype)
        x2 = jax.random.normal(key, (n, h // 4, w // 4, c), dtype)
        jax.block_until_ready((x0, x1, x2))

        def gf(hh, ww, ci, co, k):
            return 2.0 * n * hh * ww * k * k * ci * co / 1e9

        cases = [
            ("down1 5x5s2 3->32  ", lambda x: conv_relu(x, k1, 2) + b1, x0,
             gf(h // 2, w // 2, 3, 32, 5)),
            ("down2 5x5s2 32->C  ", lambda x: conv_relu(x, k2, 2) + b2, x1,
             gf(h // 4, w // 4, 32, c, 5)),
            ("refine1 3x3 C->C   ", lambda x: conv_relu(x, k3, 1) + b3, x2,
             gf(h // 4, w // 4, c, c, 3)),
            ("refine2 3x3 C->C   ", lambda x: conv_relu(x, k4, 1) + b4, x2,
             gf(h // 4, w // 4, c, c, 3)),
            ("full tower         ", lambda x: tower.apply(
                {"params": params}, x), x0, None),
        ]
        print(f"--- stereo b={bp} (tower batch {n}) ---", flush=True)
        total = 0.0
        for label, fn, arg, gflop in cases:
            ms = timeit(loop(fn), (arg,), iters) * 1e3
            if gflop is not None:
                total += ms
                print(f"  {label}: {ms:7.3f} ms  ({gflop / ms:6.1f} TF/s eff)",
                      flush=True)
            else:
                print(f"  {label}: {ms:7.3f} ms  (sum of convs {total:.3f})",
                      flush=True)


if __name__ == "__main__":
    main()
