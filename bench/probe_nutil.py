"""MXU N-dimension (output-channel lane fill) probe — round-3 grounding
for the encoder/decoder packing decisions (VERDICT r2 next-#1/#7).

Question: does an XLA conv with Cout=64 (half the 128 lanes) or Cout=32
actually run at ~half/quarter the per-MAC rate of a Cout=128 conv on
v5e? If yes, column-packing the N-starved convs (the dispconv trick at
block=2/4) has real headroom; if no, the encoder MXU lever is dead and
only epilogue/bandwidth work remains.

Also times epilogue costs (bare conv vs +bias/relu vs full BasicBlock
with residual) to see what a fused Pallas encoder block could save.

Every timed fn consumes the perturbed operand (fori_loop hoisting trap,
BASELINE.md round-2 lesson).

Usage: python -u bench/probe_nutil.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax


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


def conv(x, k, stride=1, pad=1):
    return lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    # Same MAC count (9*H*W*C^2 b = const), varying channel width:
    # (96,288,64) / (48,144,128) / (24,72,256). MACs/img = 4*9*HWC^2.
    cases = []
    for i, (h, w, c) in enumerate([(96, 288, 64), (48, 144, 128), (24, 72, 256)]):
        x = jax.random.normal(ks[i], (b, h, w, c), dtype)
        k = jax.random.normal(ks[i + 8], (3, 3, c, c), dtype) * 0.05
        macs = b * h * w * 9 * c * c
        cases.append((f"conv3x3 {c:3d}->{c:<3d} @({h},{w})", x, k, macs))

    print(f"b={b} bf16; equal-MAC channel sweep:", flush=True)
    for label, x, k, macs in cases:
        jax.block_until_ready(x)
        ms = timeit(loop(lambda t, k=k: conv(t, k)), (x,), iters) * 1e3
        tf = 2 * macs / (ms / 1e3) / 1e12
        print(f"  {label}: {ms:7.2f} ms  {tf:6.1f} TFLOP/s", flush=True)

    # Column-packed-by-2 equivalent of the 64->64 conv: kernel
    # (3, 4, 64, 128), stride (1, 2) — 4/3 FLOPs at 2x lane fill.
    x64, k64, macs64 = cases[0][1], cases[0][2], cases[0][3]
    zeros = jnp.zeros((3, 64, 64), dtype)
    colsA = [k64[:, v] if 0 <= v <= 2 else jnp.zeros_like(zeros) for v in range(4)]
    colsB = [
        k64[:, v - 1] if 0 <= v - 1 <= 2 else jnp.zeros_like(zeros)
        for v in range(4)
    ]
    kp2 = jnp.stack(
        [jnp.concatenate([a, b_], axis=-1) for a, b_ in zip(colsA, colsB)], axis=1
    )  # (3, 4, 64, 128)

    def conv_cp2(t):
        return lax.conv_general_dilated(
            jnp.pad(t, ((0, 0), (1, 1), (1, 2), (0, 0))),
            kp2, (1, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ms = timeit(loop(conv_cp2), (x64,), iters) * 1e3
    print(
        f"  colpack2 64->[2x64] @(96,288): {ms:7.2f} ms  "
        f"(useful {2 * macs64 / (ms / 1e3) / 1e12:5.1f} TFLOP/s)",
        flush=True,
    )

    # Epilogue cost at the layer1 shape: bare vs +bias/relu vs
    # BasicBlock (conv-bn-relu-conv-bn-add-relu, BN as affine).
    s = jnp.float32(1.02).astype(dtype)
    bias = jax.random.normal(ks[7], (64,), dtype) * 0.01

    def conv_br(t):
        return jax.nn.relu(conv(t, k64) * s + bias)

    def basic_block(t):
        y = jax.nn.relu(conv(t, k64) * s + bias)
        y = conv(y, k64) * s + bias
        return jax.nn.relu(y + t)

    for label, fn in [("conv64 bare    ", lambda t: conv(t, k64)),
                      ("conv64+bn+relu ", conv_br),
                      ("basicblock64   ", basic_block)]:
        ms = timeit(loop(fn), (x64,), iters) * 1e3
        print(f"  {label}: {ms:7.2f} ms", flush=True)

    # Stem: 7x7s2 3->64 vs column-packed-by-2 stem (7,9,3,128)/(2,4).
    h, w = 384, 1152
    xs = jax.random.normal(ks[3], (b, h, w, 3), dtype)
    k7 = jax.random.normal(ks[4], (7, 7, 3, 64), dtype) * 0.1
    macs_stem = b * (h // 2) * (w // 2) * 49 * 3 * 64

    def stem(t):
        return conv(t, k7, stride=2, pad=3)

    z7 = jnp.zeros((7, 3, 64), dtype)
    colsA = [k7[:, v] if 0 <= v <= 6 else z7 for v in range(9)]
    colsB = [k7[:, v - 2] if 0 <= v - 2 <= 6 else z7 for v in range(9)]
    k7p = jnp.stack(
        [jnp.concatenate([a, b_], axis=-1) for a, b_ in zip(colsA, colsB)], axis=1
    )  # (7, 9, 3, 128)

    def stem_cp2(t):
        return lax.conv_general_dilated(
            jnp.pad(t, ((0, 0), (3, 3), (3, 4), (0, 0))),
            k7p, (2, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for label, fn in [("stem 7x7s2 3->64  ", stem), ("stem colpack2     ", stem_cp2)]:
        ms = timeit(loop(fn), (xs,), iters) * 1e3
        print(
            f"  {label}: {ms:7.2f} ms  (useful "
            f"{2 * macs_stem / (ms / 1e3) / 1e12:5.1f} TFLOP/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
