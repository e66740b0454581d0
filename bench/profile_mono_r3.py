"""Round-3 stage localization of the judged mono program (b128 bf16
384x1152, currently ~94 ms/iter = 1358 fps).

Truncation timings: T(prefix) for successive pipeline prefixes, all
in-program from the production param tree, perturbed-operand fori_loop
harness. Deltas = per-stage cost. Plus ELU/relu/bare micro-probes at the
decoder's standard-level shapes (levels 4..2 still run reflect-pad
ConvBlocks — the collapse currently starts at level 1).

Usage: python -u bench/profile_mono_r3.py [batch] [iters]
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import build_mono_program, load_weights
from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.ops.collapsed import (
    collapse_upsample_conv_kernel,
    colpack_conv_edge,
    colpack_conv_edge_v2,
    colpack_conv_kernel,
    conv3x3_edge,
    conv3x3_edge_v2 as conv3x3_edge_np,
    strided_skip_conv,
    strided_skip_conv_v2,
    strided_skip_conv_kernel,
)
from scenedepthestimation_tpu.ops.packed import depth_to_space, pack_conv3x3_kernel
from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla
from scenedepthestimation_tpu.ops.preprocess import preprocess
from scenedepthestimation_tpu.ops.upsample import upsample_concat


def timeit(fn, args, iters=12, warmup=2):
    for _ in range(warmup):
        float(fn(*args, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    cfg = configs.get("mono_kitti_384x1152_bench")
    cfg = dataclasses.replace(cfg, batch_size=b)
    h, w = cfg.mono.height, cfg.mono.width
    dtype = jnp.bfloat16
    predictor = load_weights(None, cfg, seed=0)
    variables = predictor.variables
    dec_params = variables["params"]["decoder"]

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    enc = ResNetEncoder(num_layers=18, dtype=dtype)
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }

    def p(name):
        q = dec_params[name]["conv"]
        return q["kernel"], q["bias"]

    def cb(name, t):
        k, bias = p(name)
        return conv3x3_xla(
            t.astype(dtype), k.astype(dtype), bias.astype(dtype), "elu"
        )

    c0, c1 = cfg.mono.dec_channels[0], cfg.mono.dec_channels[1]

    # Pipeline prefixes. Each returns a scalar-reducible tensor.
    def pre_only(x8):
        return preprocess(x8, (h, w), cfg.pre, compute_dtype=dtype)

    def enc_only(x8):
        return enc.apply(enc_vars, pre_only(x8))[-1]

    def levels_42(x8):
        feats = enc.apply(enc_vars, pre_only(x8))
        x = feats[-1]
        for i in (4, 3, 2):
            x = cb(f"upconv_{i}_0", x)
            x = upsample_concat(x, feats[i - 1], mode="nearest")
            x = cb(f"upconv_{i}_1", x)
        return x

    def thru_y1p(x8):
        feats = enc.apply(enc_vars, pre_only(x8))
        x = feats[-1]
        for i in (4, 3, 2):
            x = cb(f"upconv_{i}_0", x)
            x = upsample_concat(x, feats[i - 1], mode="nearest")
            x = cb(f"upconv_{i}_1", x)
        t = cb("upconv_1_0", x)
        k11, b11 = p("upconv_1_1")
        k11 = k11.astype(dtype)
        y1p = conv3x3_edge_np(t, collapse_upsample_conv_kernel(k11[:, :, :c1, :]))
        y1p = y1p + strided_skip_conv_v2(
            feats[0].astype(dtype), strided_skip_conv_kernel(k11[:, :, c1:, :])
        )
        return jax.nn.elu(y1p + jnp.tile(b11.astype(dtype), 4))

    def thru_y0p(x8):
        y1p = thru_y1p(x8)
        k00, b00 = p("upconv_0_0")
        k01, b01 = p("upconv_0_1")
        zp = jax.nn.elu(
            conv3x3_edge_np(y1p, pack_conv3x3_kernel(k00.astype(dtype)))
            + jnp.tile(b00.astype(dtype), 4)
        )
        z = depth_to_space(zp)
        return jax.nn.elu(
            conv3x3_edge_np(z, collapse_upsample_conv_kernel(k01.astype(dtype)))
            + jnp.tile(b01.astype(dtype), 4)
        )

    program = build_mono_program(cfg, predictor.model)

    def full(x8):
        return program(variables, x8)["depth"]

    def loop_img(fn):
        @jax.jit
        def t(x8, n):
            def body(i, acc):
                y = fn(x8 + i.astype(jnp.uint8))
                return acc + y.mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        return t

    stages = [
        ("preprocess      ", pre_only),
        ("+encoder        ", enc_only),
        ("+levels 4..2    ", levels_42),
        ("+level1 (y1p)   ", thru_y1p),
        ("+level0 (y0p)   ", thru_y0p),
        ("full program    ", full),
    ]
    prev = 0.0
    for label, fn in stages:
        ms = timeit(loop_img(fn), (img,), iters) * 1e3
        print(f"{label}: {ms:8.2f} ms  (delta {ms - prev:+7.2f})", flush=True)
        prev = ms

    # --- micro: ELU vs ReLU vs bare at standard-level shapes -----------
    key = jax.random.PRNGKey(1)
    for (hh, ww, cc_in, cc_out) in []:
        x = jax.random.normal(key, (b, hh, ww, cc_in), dtype)
        k = jax.random.normal(key, (3, 3, cc_in, cc_out), dtype) * 0.05
        bias = jnp.zeros((cc_out,), dtype)

        def loop_x(fn):
            @jax.jit
            def t(x, n):
                def body(i, acc):
                    y = fn(x + (i * 1e-6).astype(dtype))
                    return acc + y.mean().astype(jnp.float32)

                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            return t

        for act in ("none", "relu", "elu"):
            ms = (
                timeit(
                    loop_x(lambda t, a=act: conv3x3_xla(t, k, bias, a)),
                    (x,),
                    iters,
                )
                * 1e3
            )
            print(
                f"reflectpad conv {cc_in}->{cc_out} @({hh},{ww}) {act:4s}: "
                f"{ms:7.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
