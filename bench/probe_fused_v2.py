"""Fused-tail v2 (per-phase dense dots) vs v1 vs the XLA chain, at the
judged mono config's tail shapes (y1p (b, 96, 288, 128) bf16 → y0pp),
perturbed-operand fori_loop harness. Then the e2e judged metric with
the v2 tail forced ON.

Usage: python -u bench/probe_fused_v2.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops import collapsed, packed
from scenedepthestimation_tpu.ops.pallas.fused_tail import fused_tail_pallas
from scenedepthestimation_tpu.ops.pallas.fused_tail_v2 import (
    fused_tail_pallas_v2,
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
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    c1, c0 = 32, 16  # decoder channels (judged config)

    y1p = jax.random.normal(key, (b, 96, 288, 4 * c1), dtype)
    k00 = jax.random.normal(key, (3, 3, c1, c0), dtype) * 0.1
    b00 = jnp.zeros((c0,), dtype)
    k01 = jax.random.normal(key, (3, 3, c0, c0), dtype) * 0.1
    b01 = jnp.zeros((c0,), dtype)
    w00p = packed.pack_conv3x3_kernel(k00)
    w01pp = packed.pack_conv3x3_kernel(
        collapsed.collapse_upsample_conv_kernel(k01)
    )
    jax.block_until_ready(y1p)

    def xla_chain(t):
        zp = jax.nn.elu(
            collapsed.conv3x3_edge_v2(t, w00p) + jnp.tile(b00, 4)
        )
        z = packed.depth_to_space(zp)
        y0p = jax.nn.elu(
            collapsed.conv3x3_edge_v2(
                z, collapsed.collapse_upsample_conv_kernel(k01)
            )
            + jnp.tile(b01, 4)
        )
        return packed.space_to_depth(y0p)

    def v1(t):
        return fused_tail_pallas(
            t, w00p, jnp.tile(b00, 4), w01pp, jnp.tile(b01, 16)
        )

    def v2(t):
        return fused_tail_pallas_v2(
            t, w00p, jnp.tile(b00, 4), w01pp, jnp.tile(b01, 16)
        )

    # numeric check first (bf16 tolerance)
    import numpy as np

    small = y1p[:2]
    ref = np.asarray(xla_chain(small), np.float32)
    for name, fn in [("v1", v1), ("v2", v2)]:
        got = np.asarray(fn(small), np.float32)
        print(f"{name} max|diff| vs XLA: {np.abs(got - ref).max():.3e}",
              flush=True)

    for name, fn in [("xla_chain", xla_chain), ("v1", v1), ("v2", v2)]:
        ms = timeit(loop(fn, dtype), (y1p,), iters) * 1e3
        print(f"{name:10s}: {ms:7.2f} ms  (b{b})", flush=True)


if __name__ == "__main__":
    main()
