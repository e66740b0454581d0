"""Pallas TPU kernel: soft-argmin disparity regression with optional
fused disp→depth epilogue (SURVEY C12 + C8; north-star hot-ops #3/#4).

One VMEM pass over the (rows, W, D) cost block computes the numerically
stable softmax over the lane-minor D axis, the expectation over
disparities, and (optionally) the stereo depth epilogue
``f·B / (disp·stride)`` — one HBM read of the volume, one (rows, W)
write, instead of XLA's reduce-reduce-mul-reduce chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _soft_argmin_kernel(cost_ref, out_ref, *, scale: float, epilogue, fb: float):
    cost = cost_ref[:].astype(jnp.float32)  # (R, W, D)
    logits = -cost
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    weights = jnp.exp(logits)
    denom = jnp.sum(weights, axis=-1)
    # tpu.iota only produces integers; cast after (Mosaic verifier).
    disps = jax.lax.broadcasted_iota(jnp.int32, cost.shape, dimension=2).astype(
        jnp.float32
    )
    num = jnp.sum(weights * disps, axis=-1)
    disp = num / denom * scale
    if epilogue == "depth":
        disp = fb / jnp.maximum(disp, 1e-6)
    out_ref[:] = disp.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "epilogue", "fb", "interpret")
)
def soft_argmin_pallas(
    cost: jnp.ndarray,
    scale: float = 1.0,
    epilogue: str = "none",
    fb: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, H, W, D) matching cost → (B, H, W) expected disparity·scale,
    or depth when ``epilogue='depth'`` (fb = focal_px * baseline_m)."""
    b, h, w, d = cost.shape
    bh = b * h
    flat = cost.reshape(bh, w, d)

    rows = 8
    while bh % rows != 0:
        rows //= 2
    vmem = rows * (w * d + w) * 4
    while vmem > 8 * 1024 * 1024 and rows > 1:
        rows //= 2
        vmem //= 2

    out = pl.pallas_call(
        functools.partial(
            _soft_argmin_kernel, scale=scale, epilogue=epilogue, fb=fb
        ),
        grid=(bh // rows,),
        in_specs=[
            pl.BlockSpec((rows, w, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * w * d,
            bytes_accessed=bh * w * d * 4 + bh * w * 4,
            transcendentals=bh * w * d,
        ),
        interpret=interpret,
    )(flat)
    return out.reshape(b, h, w)
