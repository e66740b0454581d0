"""Space-to-depth stem probe (round 3, encoder lever).

The ResNet stem (7x7 stride-2 conv on C=3) is the encoder's single most
expensive op (8.27 ms of ~32 ms at b128 — bench/probe_stem round 2) and
runs at ~32 TF/s because C=3 leaves the MXU's K dimension nearly empty
(K_eff = 7*3 = 21 per row-tap). Packing 2x2 input pixels into channels
(s2d x2) turns the same map into a 4x4 stride-1 conv on C=12 (K = 192)
at 1.31x nominal FLOPs but full-tile operand layouts:

    out[i,j] = sum_{u,v in [-3,3]} k7[u+3,v+3] x[2i+u, 2j+v]
             = sum_{a,b in [0,4)} K4[a,b] xp[i-2+a, j-2+b]
    K4[a, b, (dy*2+dx)*3+c, o] = k7[2(a-2)+dy+3, 2(b-2)+dx+3, c, o]
                                 (zero where the index falls outside)

with xp the s2d-packed input and zero padding ((2,1),(2,1)) — packed
zeros coincide with the original zero pad, so the rewrite is exact.

Usage: python -u bench/probe_stem2.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.stem import (
    DN,
    s2d_stem_conv,
    s2d_stem_kernel,
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


def loop(fn, dtype):
    @jax.jit
    def t(x, n):
        def body(i, acc):
            y = fn(x + (i * 1e-6).astype(dtype))
            return acc + y.mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    h, w = 384, 1152
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    k7 = jax.random.normal(key, (7, 7, 3, 64), jnp.float32) * 0.05
    k4 = s2d_stem_kernel(k7)
    bias = jax.random.normal(key, (64,), jnp.float32) * 0.1

    def stem_std(t, k):
        return lax.conv_general_dilated(
            t, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=DN
        )

    def stem_s2d(t, k):
        return s2d_stem_conv(t, k, 7)

    # ---- exactness (fp32, on device) --------------------------------
    xs = jax.random.normal(key, (2, h, w, 3), jnp.float32)
    ref = jax.jit(stem_std)(xs, k7)
    got = jax.jit(stem_s2d)(xs, k4)
    print(f"exactness max|diff| {float(jnp.abs(ref - got).max()):.2e}", flush=True)

    # ---- timing (bf16, perturbed-operand fori_loop) -----------------
    x = jax.random.normal(key, (b, h, w, 3), dtype)
    k7b, k4b, biasb = k7.astype(dtype), k4.astype(dtype), bias.astype(dtype)
    jax.block_until_ready(x)

    variants = [
        ("std 7x7s2 + bias/relu ", lambda t: jax.nn.relu(stem_std(t, k7b) + biasb)),
        ("s2d 4x4s1 + bias/relu ", lambda t: jax.nn.relu(stem_s2d(t, k4b) + biasb)),
        (
            "s2d + maxpool         ",
            lambda t: nnmax(jax.nn.relu(stem_s2d(t, k4b) + biasb)),
        ),
        (
            "std + maxpool         ",
            lambda t: nnmax(jax.nn.relu(stem_std(t, k7b) + biasb)),
        ),
    ]

    def nnmax(t):
        return lax.reduce_window(
            t,
            -jnp.inf if t.dtype == jnp.float32 else jnp.finfo(t.dtype).min,
            lax.max,
            (1, 3, 3, 1),
            (1, 2, 2, 1),
            ((0, 0), (1, 1), (1, 1), (0, 0)),
        )

    for label, fn in variants:
        ms = timeit(loop(fn, dtype), (x,), iters) * 1e3
        print(f"  {label}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
