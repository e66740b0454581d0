"""Probe: do C=64 3x3 convs (stereo tower refine1/2, mono ResNet layer1)
leave MXU throughput on the table, and does packing 2 spatial columns
into channels (C 64 -> 128 on both sides) recover it? (VERDICT r2
next-#7; ROADMAP #2.)

A 2-column pack views (B, H, W, C) as (B, H, W/2, 2C); a 3x3 conv on
the packed layout needs a (3, 3, 2C, 2Co) kernel (parity 0 reads packed
taps {-1, 0}, parity 1 reads {0, +1} — different shifts, so both embed
in a common 3-tap support with a zero tap each). That is 2x the nominal
FLOPs at full N=2Co fill: the pack only wins if the standard conv runs
below ~50% of peak (XLA convs contract K = 9*C = 576, so K is NOT
starved at C=64; the question is purely the N=Cout=64 fill).

Usage: python -u bench/probe_colpack_c64.py [iters]
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

DN = ("NHWC", "HWIO", "NHWC")


def colpack2_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) zero-pad 3x3 kernel -> (3, 3, 2C, 2Co) kernel on the
    2-column-packed layout (exactness pinned in-file below).

    Packed output column q' holds original columns (2q', 2q'+1) in
    channel halves p = 0, 1. Original tap dx for parity p reads column
    q = 2q' + p + dx -> packed column q' + floor((p+dx)/2), channel half
    (p+dx) mod 2. Each parity touches packed offsets {-1,0} or {0,+1};
    the common 3-tap support leaves one all-zero tap per parity."""
    c, co = k.shape[2], k.shape[3]
    kp = np.zeros((3, 3, 2 * c, 2 * co), k.dtype)
    kn = np.asarray(k)
    for p in (0, 1):  # output parity -> output channel half
        for dx, src in ((-1, 0), (0, 1), (1, 2)):  # original tap
            q = p + dx
            off, half = q // 2, q % 2  # packed tap offset, input half
            kp[:, off + 1, half * c : (half + 1) * c, p * co : (p + 1) * co] = (
                kn[:, src, :, :]
            )
    return jnp.asarray(kp)


def pack2(x):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack2(x):
    b, h, w2, c2 = x.shape
    return x.reshape(b, h, w2 * 2, c2 // 2)


def conv(x, k, pad):
    return lax.conv_general_dilated(x, k, (1, 1), pad, dimension_numbers=DN)


def timeit(fn, args, iters=64, warmup=2):
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)

    # Exactness (CPU-fast shapes, fp32)
    x = jnp.asarray(rng.normal(size=(2, 6, 12, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 4)).astype(np.float32))
    want = conv(x, k, ((1, 1), (1, 1)))
    got = unpack2(conv(pack2(x), colpack2_kernel(k), ((1, 1), (1, 1))))
    err = float(jnp.abs(want - got).max())
    print(f"exactness max|diff| {err:.2e}", flush=True)
    assert err < 1e-5

    cases = [
        ("tower refine (2x16 views)", (32, 96, 288, 64), 64),
        ("mono layer1 (b128)", (128, 48, 160, 64), 64),
        ("agg enc0-ish C48+64->64", (16, 96, 288, 112), 64),
    ]
    for label, shape, co in cases:
        xb = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        kb = jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, shape[-1], co), jnp.bfloat16
        ) * 0.1
        kp = colpack2_kernel(kb)
        jax.block_until_ready((xb, kb, kp))
        t_std = timeit(loop(lambda v: conv(v, kb, ((1, 1), (1, 1)))), (xb,), iters) * 1e3
        xp = pack2(xb)
        jax.block_until_ready(xp)
        t_pk = timeit(loop(lambda v: conv(v, kp, ((1, 1), (1, 1)))), (xp,), iters) * 1e3
        # packed including the relayouts at the boundary
        t_pkrt = timeit(
            loop(lambda v: unpack2(conv(pack2(v), kp, ((1, 1), (1, 1))))),
            (xb,),
            iters,
        ) * 1e3
        gflop = 2 * np.prod(shape) * 9 * co / 1e9
        print(
            f"{label}: std {t_std:7.3f} ms ({gflop / t_std:6.1f} TF/s)"
            f"   packed {t_pk:7.3f} ({gflop / t_pk:6.1f})"
            f"   packed+relayout {t_pkrt:7.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
