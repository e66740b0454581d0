"""Does a materialized jnp.pad copy cost real time vs the conv's native
zero padding, and does a border-strip dus fix recover it? (round-3 tail
investigation — the collapsed path materializes edge/reflect pads of
multi-GB tensors at b128).

Usage: python -u bench/probe_pad.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax


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

    for (h, w, ci, co) in [(96, 288, 128, 64), (192, 576, 16, 64), (192, 576, 64, 4)]:
        x = jax.random.normal(key, (b, h, w, ci), dtype)
        k = jax.random.normal(key, (3, 3, ci, co), dtype) * 0.05
        jax.block_until_ready(x)
        dn = ("NHWC", "HWIO", "NHWC")

        def conv_native(t):
            return lax.conv_general_dilated(
                t, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
            )

        def conv_padzero(t):
            return lax.conv_general_dilated(
                jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0))),
                k, (1, 1), "VALID", dimension_numbers=dn,
            )

        def conv_padedge(t):
            return lax.conv_general_dilated(
                jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
                k, (1, 1), "VALID", dimension_numbers=dn,
            )

        def conv_borderfix(t):
            # zero-pad conv + recompute the 4 edge-touching strips with
            # true EDGE semantics, dus'd into place.
            y = conv_native(t)
            # top/bottom strips from 2-row slices, edge-padded
            top = lax.conv_general_dilated(
                jnp.pad(t[:, :2], ((0, 0), (1, 0), (1, 1), (0, 0)), mode="edge"),
                k, (1, 1), "VALID", dimension_numbers=dn,
            )
            bot = lax.conv_general_dilated(
                jnp.pad(t[:, -2:], ((0, 0), (0, 1), (1, 1), (0, 0)), mode="edge"),
                k, (1, 1), "VALID", dimension_numbers=dn,
            )
            y = lax.dynamic_update_slice(y, top, (0, 0, 0, 0))
            y = lax.dynamic_update_slice(y, bot, (0, y.shape[1] - 1, 0, 0))
            left = lax.conv_general_dilated(
                jnp.pad(t[:, :, :2], ((0, 0), (1, 1), (1, 0), (0, 0)), mode="edge"),
                k, (1, 1), "VALID", dimension_numbers=dn,
            )
            right = lax.conv_general_dilated(
                jnp.pad(t[:, :, -2:], ((0, 0), (1, 1), (0, 1), (0, 0)), mode="edge"),
                k, (1, 1), "VALID", dimension_numbers=dn,
            )
            y = lax.dynamic_update_slice(y, left, (0, 0, 0, 0))
            y = lax.dynamic_update_slice(y, right, (0, 0, y.shape[2] - 1, 0))
            return y

        print(f"({h},{w},{ci}->{co}) b{b}:", flush=True)
        for label, fn in [
            ("native zero-pad   ", conv_native),
            ("jnp.pad zero+VALID", conv_padzero),
            ("jnp.pad edge+VALID", conv_padedge),
            ("borderfix (edge)  ", conv_borderfix),
        ]:
            print(f"  compiling {label}...", flush=True)
            ms = timeit(loop(fn, dtype), (x,), iters) * 1e3
            print(f"  {label}: {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
