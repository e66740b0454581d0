"""Per-op timing of the standard decoder tail (b128 bf16 384x1152):
which of the 5 convs + pads + upsample carries the 62 ms.

Also times the zero-pad variant of each conv (padding folded into the
conv op — free in XLA) to bound the reflect-pad-copy cost, and ELU-less
variants to bound the unfused-activation cost.

Usage: python -u bench/profile_tail_ops.py [batch]
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

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla


def timeit(fn, args, iters=16, warmup=2):
    for _ in range(warmup):
        float(fn(*args, warmup))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def conv_zero_pad(x, kernel, bias, activation="elu"):
    """Same conv with the pad folded into the conv op (zero border)."""
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    if activation == "elu":
        return jax.nn.elu(y)
    return y


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    shapes = [
        ("u10  64->32 @ 96x288", (96, 288, 64), 32, "elu"),
        ("u11  96->32 @192x576", (192, 576, 96), 32, "elu"),
        ("u00  32->16 @192x576", (192, 576, 32), 16, "elu"),
        ("u01  16->16 @384x1152", (384, 1152, 16), 16, "elu"),
        ("disp 16->1  @384x1152", (384, 1152, 16), 1, "none"),
    ]
    if len(sys.argv) > 2:  # e.g. "3,4" to run only u01+disp
        idx = [int(i) for i in sys.argv[2].split(",")]
        shapes = [shapes[i] for i in idx]
    for label, (h, w, cin), cout, act in shapes:
        x = jnp.asarray(rng.normal(0, 1, (b, h, w, cin)).astype(np.float32)).astype(dtype)
        k = jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)).astype(np.float32)).astype(dtype)
        bb = jnp.zeros((cout,), dtype)

        for variant, fn in (
            ("reflect+act", lambda xx: conv3x3_xla(xx, k, bb, act)),
            ("zeropad+act", lambda xx: conv_zero_pad(xx, k, bb, act)),
            ("zeropad lin", lambda xx: conv_zero_pad(xx, k, bb, "none")),
        ):
            @jax.jit
            def t(x, n, fn=fn):
                def body(i, acc):
                    y = fn(x + i.astype(dtype))
                    return acc + y.mean().astype(jnp.float32)

                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            print(f"{label} [{variant}]: {timeit(t, (x,)) * 1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
