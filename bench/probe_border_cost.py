"""Per-op cost of exact borders in the judged mono program (round 3).

The zero-border ceiling probe (run with every border-fixed conv replaced
by a plain zero-pad conv — numerically wrong at the 1-px borders, ceiling
only) measured 1822 fps vs the exact 1507: ~11.5 ms/iter of border
machinery. This probe times each border-fixed op at its b128 serving
shape against the plain zero-pad form to localize where those ms live.

Usage: python -u bench/probe_border_cost.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.collapsed import (
    colpack_conv_edge_v2,
    colpack_conv_kernel,
    conv3x3_edge_v2,
    conv3x3_nopad,
    strided_skip_conv_v2,
)

DN = ("NHWC", "HWIO", "NHWC")


def timeit(fn, args, iters=12, warmup=2):
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
    def t(x, k, n):
        def body(i, acc):
            y = fn(x + (i * 1e-6).astype(dtype), k)
            return acc + y.mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def zero3(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
    )


def zero4s2(x, k):
    return lax.conv_general_dilated(
        x, k, (2, 2), ((1, 2), (1, 2)), dimension_numbers=DN
    )


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # (label, h, w, cin, cout, variant)
    ops = [
        ("u40 reflect", 12, 36, 512, 256, "reflect"),
        ("u41 reflect", 24, 72, 512, 256, "reflect"),
        ("u30 reflect", 24, 72, 256, 128, "reflect"),
        ("u31 reflect", 48, 144, 256, 128, "reflect"),
        ("u20 reflect", 48, 144, 128, 64, "reflect"),
        ("u21 reflect", 96, 288, 128, 64, "reflect"),
        ("u10 reflect", 96, 288, 64, 32, "reflect"),
        ("y1p edge (collapsed)", 96, 288, 32, 128, "edge"),
        ("skip 4x4s2 reflect", 192, 576, 64, 128, "skip"),
        ("u00 edge (packed)", 96, 288, 128, 64, "edge"),
        ("u01 edge (collapsed)", 192, 576, 16, 64, "edge"),
        ("dispconv colpack edge", 192, 576, 64, 4, "colpack"),
    ]
    total_exact, total_zero = 0.0, 0.0
    for label, h, w, cin, cout, variant in ops:
        x = jax.random.normal(key, (b, h, w, cin), dtype)
        jax.block_until_ready(x)
        if variant == "skip":
            k = jax.random.normal(key, (4, 4, cin, cout), dtype) * 0.05
            exact = strided_skip_conv_v2
            zero = zero4s2
        elif variant == "colpack":
            k = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.05
            exact = colpack_conv_edge_v2

            def zero(x_, k_):
                bb, hh, ww, _ = x_.shape
                y = lax.conv_general_dilated(
                    x_, colpack_conv_kernel(k_), (1, 32), ((1, 1), (1, 1)),
                    dimension_numbers=DN,
                )
                return y.reshape(bb, hh, ww, k_.shape[-1])

        else:
            k = jax.random.normal(key, (3, 3, cin, cout), dtype) * 0.05
            if variant == "edge":
                exact = conv3x3_edge_v2
            else:

                def exact(x_, k_):
                    return conv3x3_nopad(x_, k_, mode="reflect")

            zero = zero3
        ms_e = timeit(loop(exact, dtype), (x, k), iters) * 1e3
        ms_z = timeit(loop(zero, dtype), (x, k), iters) * 1e3
        total_exact += ms_e
        total_zero += ms_z
        print(
            f"  {label:24s} ({h:3d},{w:3d},{cin:3d}->{cout:3d}): "
            f"exact {ms_e:6.2f} ms   zero {ms_z:6.2f}   border +{ms_e - ms_z:5.2f}",
            flush=True,
        )
    print(
        f"  TOTAL: exact {total_exact:.2f} ms   zero {total_zero:.2f}"
        f"   border overhead {total_exact - total_zero:.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
