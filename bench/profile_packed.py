"""Isolate the packed-tail regression: time the standard levels-1+0 tail
vs the packed tail, with kernel packing inside vs outside the timing loop.

Usage: python bench/profile_packed.py [batch]
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

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import load_weights
from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.ops import packed
from scenedepthestimation_tpu.ops.packed import (
    conv3x3_packed,
    depth_to_space,
    pack_conv3x3_kernel,
    space_to_depth,
)
from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla
from scenedepthestimation_tpu.ops.preprocess import preprocess
from scenedepthestimation_tpu.ops.upsample import upsample_concat, upsample2x


def timeit(fn, args, iters=16, warmup=2):
    for _ in range(warmup):
        float(fn(*args, warmup))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    def want(name):
        return only is None or name in only
    import dataclasses

    cfg = dataclasses.replace(
        configs.get("mono_kitti_384x1152_bench"), batch_size=b
    )
    h, w = cfg.mono.height, cfg.mono.width
    dtype = jnp.bfloat16
    predictor = load_weights(None, cfg, seed=0)
    variables = predictor.variables
    dp = variables["params"]["decoder"]

    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (b, h, w, 3), dtype=np.uint8)
    )
    x0 = preprocess(img, (h, w), cfg.pre, compute_dtype=dtype)
    enc = ResNetEncoder(num_layers=18, dtype=dtype)
    feats = ResNetEncoder(num_layers=18, dtype=dtype).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x0,
    )
    feats = [jnp.asarray(f) for f in feats]

    def cb_params(name):
        p = dp[name]["conv"]
        return p["kernel"].astype(dtype), p["bias"].astype(dtype)

    # Input to level 1: the level-2 output (standard levels 4..2).
    def levels_4_2(feats):
        x = feats[-1]
        for i in (4, 3, 2):
            k0, b0 = cb_params(f"upconv_{i}_0")
            x = conv3x3_xla(x.astype(dtype), k0, b0, "elu")
            x = upsample_concat(x, feats[i - 1], mode="nearest")
            k1, b1 = cb_params(f"upconv_{i}_1")
            x = conv3x3_xla(x, k1, b1, "elu")
        return x

    x2 = jnp.asarray(levels_4_2(feats))
    f0 = feats[0]
    hp = dp["dispconv_0"]["conv"]

    # ---- standard tail (levels 1+0 + dispconv_0) ----------------------
    def std_tail(x2, f0):
        k, bb = cb_params("upconv_1_0")
        t = conv3x3_xla(x2, k, bb, "elu")
        y = upsample_concat(t, f0, mode="nearest")
        k, bb = cb_params("upconv_1_1")
        y = conv3x3_xla(y, k, bb, "elu")
        k, bb = cb_params("upconv_0_0")
        z = conv3x3_xla(y, k, bb, "elu")
        z = upsample2x(z, mode="nearest")
        k, bb = cb_params("upconv_0_1")
        z = conv3x3_xla(z, k, bb, "elu")
        d = conv3x3_xla(
            z, hp["kernel"].astype(dtype), hp["bias"].astype(dtype), "none"
        )
        return jax.nn.sigmoid(d.astype(jnp.float32))

    @jax.jit
    def t_std(x2, f0, n):
        def body(i, acc):
            return acc + std_tail(x2 + i.astype(dtype), f0).mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    if want("std"):
        print(f"std tail          : {timeit(t_std, (x2, f0)) * 1e3:8.2f} ms/iter", flush=True)

    # ---- packed tail, packing INSIDE the loop body ---------------------
    def packed_tail(x2, f0, kp=None, use_pallas=False):
        c1 = cfg.mono.dec_channels[1]
        k11, b11 = cb_params("upconv_1_1")
        k00, b00 = cb_params("upconv_0_0")
        k01, b01 = cb_params("upconv_0_1")
        khd = hp["kernel"].astype(dtype)
        if kp is None:
            kp = dict(
                a=jnp.concatenate(
                    [
                        pack_conv3x3_kernel(k11[:, :, :c1, :]),
                        pack_conv3x3_kernel(k11[:, :, c1:, :]),
                    ],
                    axis=2,
                ),
                c=pack_conv3x3_kernel(k00),
                d=pack_conv3x3_kernel(k01),
                e=pack_conv3x3_kernel(khd),
            )
        up = use_pallas
        k, bb = cb_params("upconv_1_0")
        t = conv3x3_xla(x2, k, bb, "elu")
        x1 = jnp.concatenate(
            [jnp.tile(t, (1, 1, 1, 4)), space_to_depth(f0.astype(dtype))], -1
        )
        y = conv3x3_packed(x1, kp["a"], b11, "elu", use_pallas=up)
        z = conv3x3_packed(y, kp["c"], b00, "elu", use_pallas=up)
        z = depth_to_space(z)
        y0 = conv3x3_packed(
            jnp.tile(z, (1, 1, 1, 4)), kp["d"], b01, "elu", use_pallas=up
        )
        d = conv3x3_packed(
            y0,
            kp["e"],
            hp["bias"].astype(dtype),
            "sigmoid",
            use_pallas=up,
            out_dtype=jnp.float32,
        )
        return depth_to_space(d)

    @jax.jit
    def t_packed_in(x2, f0, n):
        def body(i, acc):
            return acc + packed_tail(x2 + i.astype(dtype), f0).mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    if want("packin"):
        print(
            f"packed (pack in)  : {timeit(t_packed_in, (x2, f0)) * 1e3:8.2f} ms/iter",
            flush=True,
        )

    # ---- packed tail, kernels PRE-PACKED outside ------------------------
    c1 = cfg.mono.dec_channels[1]
    k11, _ = cb_params("upconv_1_1")
    k00, _ = cb_params("upconv_0_0")
    k01, _ = cb_params("upconv_0_1")
    kp_pre = {
        "a": jnp.asarray(
            jnp.concatenate(
                [
                    pack_conv3x3_kernel(k11[:, :, :c1, :]),
                    pack_conv3x3_kernel(k11[:, :, c1:, :]),
                ],
                axis=2,
            )
        ),
        "c": jnp.asarray(pack_conv3x3_kernel(k00)),
        "d": jnp.asarray(pack_conv3x3_kernel(k01)),
        "e": jnp.asarray(pack_conv3x3_kernel(hp["kernel"].astype(dtype))),
    }

    @jax.jit
    def t_packed_pre(x2, f0, kp, n):
        def body(i, acc):
            return acc + packed_tail(x2 + i.astype(dtype), f0, kp).mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    if want("prepack"):
        print(
            f"packed (pre-pack) : {timeit(t_packed_pre, (x2, f0, kp_pre)) * 1e3:8.2f} ms/iter",
            flush=True,
        )

    # ---- packed tail via the Pallas edge-border kernel ------------------
    @jax.jit
    def t_packed_pallas(x2, f0, kp, n):
        def body(i, acc):
            return acc + packed_tail(
                x2 + i.astype(dtype), f0, kp, use_pallas=True
            ).mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    if want("pallas"):
        print(
            f"packed (pallas)   : {timeit(t_packed_pallas, (x2, f0, kp_pre)) * 1e3:8.2f} ms/iter",
            flush=True,
        )

    # ---- piecewise: each packed conv alone ------------------------------
    X1 = jnp.asarray(space_to_depth(f0.astype(dtype)))  # (96,288,256)

    for label, xin, kp1 in (
        ("pconv 384->128 @96x288", jnp.concatenate([X1, X1[..., :128]], -1), pack_conv3x3_kernel(jnp.zeros((3, 3, 96, 32), dtype))),
        ("pconv 256->128 @96x288", X1, pack_conv3x3_kernel(jnp.zeros((3, 3, 64, 32), dtype))),
        ("pconv 64->64 @192x576", jnp.tile(depth_to_space(X1[..., :64]), (1, 1, 1, 4))[:, :, :, :64], pack_conv3x3_kernel(jnp.zeros((3, 3, 16, 16), dtype))),
    ):
        kp1 = jnp.asarray(kp1)

        @jax.jit
        def t_one(xin, kp1, n):
            def body(i, acc):
                y = conv3x3_packed(xin + i.astype(dtype), kp1, None, "elu")
                return acc + y.mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        if want("pieces"):
            print(f"{label}: {timeit(t_one, (xin, kp1)) * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
