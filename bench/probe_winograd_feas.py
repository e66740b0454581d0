"""Mosaic feasibility probes for a fused Winograd F(2x2,3x3) conv kernel
(ROADMAP r3 #1's "only named idea left" class — beat the direct-conv
encoder floor).

Three questions, each answered by compiling+running a micro-kernel on
the real chip:

1. Can Mosaic lower a STRIDE-2 SUBLANE slice of a VMEM value
   (``x[0:2*t:2]``)? If yes, the Winograd kernel can consume raw NHWC
   slabs with no phase-packing pass.
2. If not: does the reshape trick ((2T, W, C) -> (T, 2, W, C) ->
   [:, k]) lower, and at what cost?
3. Throughput of the core Winograd inner product shape: 16 batched
   (M, C) @ (C, Co) dots accumulating in fp32, M = tile count per
   block — is the MXU rate near peak at C=64/128?

Usage: python -u bench/probe_winograd_feas.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timed(fn, *args, iters=50):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def probe_strided_slice():
    """x (2T, W, C) -> x[0::2] + x[1::2]."""
    T, W, C = 16, 288, 64

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = x[0 : 2 * T : 2] + x[1 : 2 * T : 2]

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2 * T, W, C)), jnp.float32
    )

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(fn)(x)
        ref = x[0::2] + x[1::2]
        ok = bool(jnp.max(jnp.abs(out - ref)) < 1e-6)
        ms = _timed(jax.jit(fn), x)
        print(f"strided_slice: COMPILES ok={ok} {ms:.3f} ms")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"strided_slice: FAILS — {type(e).__name__}: {str(e)[:300]}")
        return False


def probe_reshape_phase():
    T, W, C = 16, 288, 64

    def kernel(x_ref, o_ref):
        x = x_ref[:].reshape(T, 2, W, C)
        o_ref[:] = x[:, 0] + x[:, 1]

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2 * T, W, C)), jnp.float32
    )
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        out = jax.jit(fn)(x)
        ref = x[0::2] + x[1::2]
        ok = bool(jnp.max(jnp.abs(out - ref)) < 1e-6)
        ms = _timed(jax.jit(fn), x)
        print(f"reshape_phase: COMPILES ok={ok} {ms:.3f} ms")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"reshape_phase: FAILS — {type(e).__name__}: {str(e)[:300]}")
        return False


def probe_batched_dot(C=64, M=1152, dtype=jnp.bfloat16):
    """16 (M, C) @ (C, C) dots with fp32 accumulation, one kernel call.

    This is the Winograd core; rate should approach the bf16 MXU peak
    for the win to materialize.
    """

    def kernel(v_ref, u_ref, o_ref):
        for k in range(16):
            o_ref[k] = jnp.dot(
                v_ref[k], u_ref[k], preferred_element_type=jnp.float32
            )

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(16, M, C)), dtype)
    u = jnp.asarray(rng.normal(size=(16, C, C)), dtype)
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, M, C), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        jitted = jax.jit(fn)
        out = jitted(v, u)
        ref = jax.lax.dot_general(
            v.astype(jnp.float32),
            u.astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
        )
        err = float(jnp.max(jnp.abs(out - ref)))
        ms = _timed(jitted, v, u)
        tf = 16 * 2 * M * C * C / (ms / 1e3) / 1e12
        print(
            f"batched_dot C={C} M={M} {np.dtype(dtype).name}: "
            f"{ms:.3f} ms = {tf:.1f} TF/s, err={err:.2e}"
        )
        return True
    except Exception as e:  # noqa: BLE001
        print(f"batched_dot C={C}: FAILS — {type(e).__name__}: {str(e)[:300]}")
        return False


if __name__ == "__main__":
    print("jax devices:", jax.devices())
    probe_strided_slice()
    probe_reshape_phase()
    probe_batched_dot(C=64, M=1152)
    probe_batched_dot(C=128, M=1152)
    probe_batched_dot(C=256, M=512)
