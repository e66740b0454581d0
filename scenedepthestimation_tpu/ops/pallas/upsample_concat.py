"""Pallas TPU kernel: fused nearest-2x-upsample + channel concat
(SURVEY C7; north-star hot-op #1).

Fuses the decoder's ``upsample2x(x) ++ skip`` into one VMEM pass: each
grid step reads a row-block of the coarse map and the matching 2x
row-block of the skip connection and writes the interleaved output once
— instead of materializing the upsampled tensor and the concat as two
HBM round-trips.

Kept behind the ops.upsample dispatch flag: XLA usually fuses the
broadcast+concat into the consumer conv already; the kernel exists for
the cases (and measurement) where it does not (see bench/kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _upconcat_kernel(x_ref, skip_ref, out_ref):
    x = x_ref[:]  # (R, W, C1)
    skip = skip_ref[:]  # (2R, 2W, C2)
    r, w, c1 = x.shape
    up = jnp.broadcast_to(x[:, None, :, None, :], (r, 2, w, 2, c1)).reshape(
        2 * r, 2 * w, c1
    )
    out_ref[:, :, :c1] = up.astype(out_ref.dtype)
    out_ref[:, :, c1:] = skip.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def upsample_concat_pallas(
    x: jnp.ndarray, skip: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """x (B, H, W, C1), skip (B, 2H, 2W, C2) → (B, 2H, 2W, C1+C2)."""
    b, h, w, c1 = x.shape
    bs, hs, ws, c2 = skip.shape
    if (bs, hs, ws) != (b, 2 * h, 2 * w):
        raise ValueError(f"skip {skip.shape} does not match 2x of {x.shape}")

    xf = x.reshape(b * h, w, c1)
    sf = skip.reshape(b * hs, ws, c2)

    rows = 8
    while (b * h) % rows != 0:
        rows //= 2
    vmem = rows * (w * c1 + 4 * w * c2 + 4 * w * (c1 + c2)) * 4
    while vmem > 8 * 1024 * 1024 and rows > 1:
        rows //= 2
        vmem //= 2

    out = pl.pallas_call(
        _upconcat_kernel,
        grid=((b * h) // rows,),
        in_specs=[
            pl.BlockSpec((rows, w, c1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (2 * rows, 2 * w, c2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (2 * rows, 2 * w, c1 + c2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * hs, ws, c1 + c2), x.dtype),
        interpret=interpret,
    )(xf, sf)
    return out.reshape(b, hs, ws, c1 + c2)
