"""Probe: int8 convolution on the v5e MXU via XLA — supported? faster?

Times representative encoder/decoder conv shapes in bf16 vs int8
(int8 operands, int32 accumulation, fp32 dequant epilogue) to decide
whether an int8 inference mode (ROADMAP r1 #2 / VERDICT r1 next-#7) can
pay. v5e peak is 394 TOPS int8 vs 197 TFLOP/s bf16.

Usage: python -u bench/probe_int8.py [batch] [iters]
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


def loop(fn, pert_dtype):
    @jax.jit
    def t(x, n):
        def body(i, acc):
            if pert_dtype == jnp.int8:
                xi = x + (i % 2).astype(jnp.int8)
            else:
                xi = x + (i.astype(jnp.float32) * 1e-6).astype(pert_dtype)
            return acc + fn(xi).mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def conv(x, k, strides=(1, 1)):
    return lax.conv_general_dilated(
        x, k, strides, "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8 else jnp.float32,
    )


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    key = jax.random.PRNGKey(0)
    shapes = [
        ("enc layer1 (96,288,64)->64 ", (b, 96, 288, 64), (3, 3, 64, 64)),
        ("enc layer2 (48,144,128)->128", (b, 48, 144, 128), (3, 3, 128, 128)),
        ("dec level1 (96,288,128)->128", (b, 96, 288, 128), (3, 3, 128, 128)),
    ]
    for label, xs, ks in shapes:
        for dt in (jnp.bfloat16, jnp.int8):
            if dt == jnp.int8:
                x = jax.random.randint(key, xs, -127, 127, jnp.int8)
                k = jax.random.randint(key, ks, -127, 127, jnp.int8)
            else:
                x = jax.random.normal(key, xs, dt)
                k = jax.random.normal(key, ks, dt) * 0.1
            jax.block_until_ready((x, k))
            try:
                ms = timeit(loop(lambda xi: conv(xi, k), dt), (x,), iters) * 1e3
                print(f"{label} [{jnp.dtype(dt).name:8s}]: {ms:8.2f} ms/iter",
                      flush=True)
            except Exception as e:
                print(f"{label} [{jnp.dtype(dt).name:8s}]: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
