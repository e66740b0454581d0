"""ELU epilogue cost at the judged decoder shapes.

The round-3 mono loop trace (bench/trace_mono_loop.py) shows
compare_select (ELU) fusions totalling ~14 ms of the 75 ms iteration —
the biggest single one 7.14 ms on the (128,96,288,128) collapsed
level-1 output (~1.8 GB read+write = 254 GB/s effective vs ~820 peak).
Round 1 established XLA cannot fuse ELU into TPU convs; this probe asks
the narrower questions:

  1. what does an ISOLATED jnp ELU cost at that shape (how much of the
     7.14 ms is the ELU itself vs fusion contamination)?
  2. does a Pallas elementwise ELU beat it (is XLA's elementwise
     codegen below memory bandwidth here)?
  3. what is the MARGINAL in-program cost: conv+bias vs conv+bias+ELU?

Usage: python -u bench/probe_elu.py
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl


def timeit(fn, args, iters=32, warmup=2):
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


def _elu_kernel(x_ref, o_ref):
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    # expm1 has no Mosaic lowering on this toolchain; exp-1 differs by
    # ~eps only for |x| << 1 where ELU ~ x anyway.
    o_ref[...] = jnp.where(xf > 0, xf, jnp.exp(xf) - 1.0).astype(x.dtype)


def pallas_elu(x: jnp.ndarray, block_rows: int = 256) -> jnp.ndarray:
    """Elementwise ELU on a flattened (R, 128k) view, row-blocked."""
    orig = x.shape
    flat = x.reshape(-1, orig[-1])
    r = flat.shape[0]
    br = min(block_rows, r)
    while r % br:
        br //= 2
    out = pl.pallas_call(
        _elu_kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, flat.dtype),
        grid=(r // br,),
        in_specs=[pl.BlockSpec((br, flat.shape[1]), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((br, flat.shape[1]), lambda i: (i, 0)),
    )(flat)
    return out.reshape(orig)


def main():
    shape = (128, 96, 288, 128)
    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, shape, dtype)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), dtype) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (128,), dtype)
    jax.block_until_ready((x, k, b))
    gb = 2 * np.prod(shape) * 2 / 1e9

    ms = timeit(loop(jax.nn.elu), (x,)) * 1e3
    print(f"jnp ELU isolated      : {ms:7.3f} ms  ({gb / (ms / 1e3):5.0f} GB/s)")

    ms = timeit(loop(jax.nn.relu), (x,)) * 1e3
    print(f"jnp ReLU isolated     : {ms:7.3f} ms  ({gb / (ms / 1e3):5.0f} GB/s)")

    ms = timeit(loop(pallas_elu), (x,)) * 1e3
    print(f"pallas ELU isolated   : {ms:7.3f} ms  ({gb / (ms / 1e3):5.0f} GB/s)")

    # exactness
    got = pallas_elu(x)
    want = jax.nn.elu(x.astype(jnp.float32)).astype(dtype)
    print("pallas max |diff| vs fp32-computed ELU:",
          float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))))

    def conv(t):
        return lax.conv_general_dilated(
            t, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    ms_c = timeit(loop(conv), (x,), iters=16) * 1e3
    print(f"conv+bias             : {ms_c:7.3f} ms")
    ms_ce = timeit(loop(lambda t: jax.nn.elu(conv(t))), (x,), iters=16) * 1e3
    print(f"conv+bias+ELU         : {ms_ce:7.3f} ms  (marginal ELU {ms_ce - ms_c:.3f})")
    ms_cp = timeit(loop(lambda t: pallas_elu(conv(t))), (x,), iters=16) * 1e3
    print(f"conv+bias+pallasELU   : {ms_cp:7.3f} ms  (marginal {ms_cp - ms_c:.3f})")
    ms_cr = timeit(loop(lambda t: jax.nn.relu(conv(t))), (x,), iters=16) * 1e3
    print(f"conv+bias+ReLU        : {ms_cr:7.3f} ms  (marginal {ms_cr - ms_c:.3f})")


if __name__ == "__main__":
    main()
