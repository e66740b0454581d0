"""Per-stage timing of the ResNet-18 encoder at the judged config
(b128 bf16 384x1152): stem conv / maxpool / each residual stage, plus an
s2d-packed stem candidate (input (2,2)-packed, (4,4,12,64) stride-2
kernel — the classic conv-stem repack for C=3 inputs).

Every timed fn consumes the PERTURBED argument (the dispconv lesson:
an unperturbed operand lets XLA hoist the whole op out of the timing
loop and the number measures nothing).

Usage: python -u bench/profile_encoder.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.ops.packed import space_to_depth


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
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    h, w = 384, 1152
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    x = jax.random.normal(ks[0], (b, h, w, 3), dtype)
    f0 = jax.random.normal(ks[1], (b, h // 2, w // 2, 64), dtype)
    pooled = jax.random.normal(ks[2], (b, h // 4, w // 4, 64), dtype)
    k7 = jax.random.normal(ks[3], (7, 7, 3, 64), dtype) * 0.1
    jax.block_until_ready((x, f0, pooled))
    print("staged", flush=True)

    def stem(x):
        return lax.conv_general_dilated(
            x, k7, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # s2d-packed stem: (4, 4, 12, 64) stride-2... at the PACKED grid the
    # original stride-2 becomes stride-1 over packed rows with a 4x4
    # window (384-level rows 2p-3..2p+3 live in packed rows p-2..p+1).
    k4 = jax.random.normal(ks[4], (4, 4, 12, 64), dtype) * 0.1

    def stem_s2d(x):
        xp = space_to_depth(x)  # (B, H/2, W/2, 12)
        return lax.conv_general_dilated(
            xp, k4, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def maxpool(f0):
        return nn.max_pool(
            f0, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )

    enc = ResNetEncoder(num_layers=18, dtype=dtype)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.float32))

    def full(x):
        return enc.apply(variables, x)[-1]

    cases = [
        ("stem conv 7x7s2 (3->64)   ", stem, x),
        ("stem s2d 4x4 (12->64)     ", stem_s2d, x),
        ("maxpool 3x3s2 @(192,576)  ", maxpool, f0),
        ("full encoder              ", full, x),
    ]
    for label, fn, arg in cases:
        ms = timeit(loop(fn), (arg,), iters) * 1e3
        print(f"{label}: {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
