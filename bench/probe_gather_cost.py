"""Gather cost model on the real chip (temporal-loss floor accounting).

Times a fori-amortized take_along_axis over a (B, HW, C) table at
(8, 192*640) indices across row widths and dtypes, to establish what
the 2-D reprojection sample can and cannot gain:

  - rows <= 48 B gather at a ~flat per-INDEX rate (~8-9 ms for 983k
    indices, ~8.5 ns/idx) — f32 C=3 and f32 C=12 cost the same, so the
    corner-packed 4C=12 table rides the free row-width headroom and is
    already index-optimal.
  - beyond 48 B the cost scales with bytes (C=48 is ~6x C=12).
  - bf16 rows save nothing (index-bound); u8 rows are SLOWER (gather
    takes a narrow-dtype slow path), so raw-u8 tables lose despite 4x
    fewer bytes.
  - Pallas/Mosaic on this toolchain cannot lower a vector gather at
    all (take/take_along_axis inside a kernel crashes the Mosaic
    compile helper), so no custom kernel can bypass the XLA gather.

Usage: python -u bench/probe_gather_cost.py [batch] [iters]
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


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    h, w = 192, 640
    hw = h * w
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, hw, size=(b, hw, 1), dtype=np.int32))

    def timeit(fn, args):
        float(fn(*args, 2))
        best = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args, iters))
            best.append((time.perf_counter() - t0) / iters)
        return sorted(best)[1] * 1e3

    def make(dtype, c):
        tab = jnp.asarray(rng.random((b, hw, c)).astype(np.float32))
        tab = (
            (tab * 255).astype(jnp.uint8)
            if dtype == jnp.uint8
            else tab.astype(dtype)
        )

        @jax.jit
        def f(tab, idx, n):
            def body(i, acc):
                g = jnp.take_along_axis(
                    tab, jnp.minimum(idx + i, hw - 1), axis=1
                )
                return acc + g.astype(jnp.float32).sum()

            return lax.fori_loop(0, n, body, jnp.float32(0))

        return f, tab

    n_idx = b * hw
    for name, dt, c in [
        ("f32 c3", jnp.float32, 3),
        ("f32 c12", jnp.float32, 12),
        ("f32 c24", jnp.float32, 24),
        ("f32 c48", jnp.float32, 48),
        ("bf16 c12", jnp.bfloat16, 12),
        ("u8 c12", jnp.uint8, 12),
    ]:
        f, tab = make(dt, c)
        ms = timeit(f, (tab, idx))
        nbytes = n_idx * c * tab.dtype.itemsize
        print(
            f"{name:9s}: {ms:7.2f} ms  ({nbytes / 1e6:6.1f} MB gathered, "
            f"{ms * 1e6 / n_idx:5.2f} ns/idx)",
            flush=True,
        )


if __name__ == "__main__":
    main()
