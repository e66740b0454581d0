"""Fused Winograd F(2x2,3x3) Pallas conv vs XLA direct conv at the
ResNet-18 encoder's stride-1 conv shapes (the judged program's largest
stage, recorded at its direct-conv XLA floor in BASELINE.md round 3).

Per shape (b128 bf16): direct conv+bias+relu (XLA), the fused Winograd
kernel in phase space, and the split/interleave passes that bracket a
phase-space CHAIN (amortized over a stage, not per conv).

Usage: python -u bench/probe_winograd.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.pallas.winograd import (
    conv3x3_reference,
    phases_to_space,
    space_to_phases,
    transform_weights,
    winograd_conv3x3_phases,
)


def timeit(fn, args, iters=10, warmup=2):
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
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    shapes = [
        ("layer1", 96, 288, 64),
        ("layer2", 48, 144, 128),
        ("layer3", 24, 72, 256),
        ("layer4", 12, 36, 512),
    ]

    for name, h, w, c in shapes:
        kf = jax.random.normal(key, (3, 3, c, c), jnp.float32) * (
            1.0 / (3.0 * c**0.5)
        )
        bias = jax.random.normal(key, (c,), jnp.float32) * 0.1
        u = transform_weights(kf)
        x = jax.random.normal(key, (b, h, w, c), dtype)
        phases = space_to_phases(x)

        # exactness on chip, bf16 (vs the same-dtype direct conv)
        got = phases_to_space(
            winograd_conv3x3_phases(phases, u, bias, relu=True)
        )
        ref = conv3x3_reference(x, kf, bias, relu=True)
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        )

        @jax.jit
        def t_direct(xx, n, kf=kf, bias=bias):
            kb = kf.astype(dtype)

            def body(i, acc):
                y = conv3x3_reference(
                    xx + (i * 1e-6).astype(dtype), kb, bias, relu=True
                )
                return acc + y.mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        @jax.jit
        def t_wino(pp, n, u=u, bias=bias):
            def body(i, acc):
                d = (i * 1e-6).astype(dtype)
                outs = winograd_conv3x3_phases(
                    tuple(p + d for p in pp), u, bias, relu=True
                )
                return acc + outs[0].mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        @jax.jit
        def t_split(xx, n):
            def body(i, acc):
                pp = space_to_phases(xx + (i * 1e-6).astype(dtype))
                y = phases_to_space(pp)
                return acc + y.mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms_d = timeit(t_direct, (x,), iters) * 1e3
        ms_w = timeit(t_wino, (phases,), iters) * 1e3
        ms_s = timeit(t_split, (x,), iters) * 1e3
        gflop = 2 * b * h * w * c * c * 9 / 1e9
        print(
            f"{name} ({h}x{w} C={c}): direct {ms_d:.3f} ms"
            f" ({gflop / ms_d:.0f} TF/s eff) | wino {ms_w:.3f} ms"
            f" ({ms_d / ms_w:.2f}x) | split+interleave {ms_s:.3f} ms"
            f" | bf16 max|diff| {err:.2e} (|ref|max {scale:.1f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
