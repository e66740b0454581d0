"""Probe: does XLA pad the trailing (lane) dim of big NHWC tensors?

Times a pure elementwise pass (x+1, forced non-hoistable) over tensors
of IDENTICAL logical bytes but different trailing dims. If HBM layout
pads the minor dim to 128 lanes, the C=16 tensor moves 8x the bytes and
the pass is ~8x slower; if layouts are dense, all rows time equal.
Also prints the device memory delta when staging each tensor.

Usage: python -u bench/probe_layout.py [batch]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax


def timeit(fn, args, iters=32, warmup=2):
    for _ in range(warmup):
        float(fn(*args, 4))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def mem_used():
    try:
        d = jax.devices()[0]
        s = d.memory_stats()
        return s.get("bytes_in_use", 0)
    except Exception:
        return 0


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    # identical logical element counts: 192*576*64 = 384*1152*16/2 ... use
    # a fixed element budget E = 96*288*256 per image.
    shapes = [
        (b, 384, 1152, 16),
        (b, 192, 576, 64),
        (b, 96, 288, 256),
        (b, 192, 576, 128),  # 2x elements of the 64 row — control
    ]
    key = jax.random.PRNGKey(0)
    for shp in shapes:
        m0 = mem_used()
        x = jax.block_until_ready(
            jax.random.normal(key, shp, dtype=jnp.bfloat16)
        )
        m1 = mem_used()

        @jax.jit
        def t(x, n):
            def body(i, acc):
                y = x + i.astype(jnp.bfloat16)
                # Full reduction so XLA cannot dead-code the pass (a
                # single-element read lets it compute just that element).
                return acc + y.mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms = timeit(t, (x,)) * 1e3
        gb = x.size * 2 / 1e9
        print(
            f"{str(shp):24s} logical {gb:5.2f} GB  device_delta "
            f"{(m1 - m0) / 1e9:6.2f} GB  add+reduce pass: {ms:7.2f} ms "
            f"({gb / (ms / 1e3):6.0f} GB/s read eff)",
            flush=True,
        )
        del x


if __name__ == "__main__":
    main()
