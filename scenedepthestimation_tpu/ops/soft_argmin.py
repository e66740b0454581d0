"""Soft-argmin disparity regression (north-star hot-op #3; SURVEY C12).

GC-Net (PAPERS.md:9) differentiable disparity readout:
``disp[b, h, w] = sum_d d * softmax(-cost, axis=D)[b, h, w, d]``.

The cost volume arrives (B, H, W, D) with D lane-minor, so the softmax
and expectation reduce along lanes — the natural VPU reduction axis. XLA
fuses the whole readout (max-subtract, exp, two reductions, divide) into
one pass; a Pallas kernel that additionally inlines the disp→depth
epilogue lives behind ``use_pallas`` (SURVEY C8+C12 fusion note).
"""

from __future__ import annotations

import jax.numpy as jnp

# Default OFF: measured on v5e at config-5 shape (B16 H96 W288 D48) the
# XLA lowering of the jnp readout beats the kernel (4.12 ms vs 4.94 ms) —
# XLA's fusion already streams the volume once. The kernel stays for the
# fused depth-epilogue variant and future shapes (bench log in BASELINE.md).
_USE_PALLAS = False


def set_use_pallas(flag: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


def soft_argmin(
    cost: jnp.ndarray,
    use_pallas: bool | None = None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """(B, H, W, D) cost volume → (B, H, W) expected disparity.

    Convention: ``cost`` is *matching cost* (lower = better), per GC-Net —
    softmax is taken over the negated cost.

    ``temperature`` scales the logits (softmax over -cost/τ). τ < 1
    sharpens the distribution toward the hard argmin. τ = 1.0 is the
    GC-Net default (reference parity). Plain hyperparameter: the
    round-3 collapse study (BASELINE.md) reproduced the high-LR
    uniform-softmax collapse and measured τ=0.5 NOT rescuing it — the
    proven rescues are the refinement escape path and the
    disparity-classification auxiliary loss.
    """
    use = _USE_PALLAS if use_pallas is None else use_pallas
    if use:
        from scenedepthestimation_tpu.ops.pallas.soft_argmin import (
            soft_argmin_pallas,
        )

        if temperature != 1.0:
            # softmax(-cost/τ) ≡ softmax(-(cost/τ)): pre-scaling keeps
            # the kernel path exact for any temperature (it previously
            # silently fell back to jnp; r2 review finding).
            cost = cost / jnp.asarray(temperature, cost.dtype)
        return soft_argmin_pallas(cost)
    return _soft_argmin_jnp(cost, temperature)


def _soft_argmin_jnp(cost: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    d = cost.shape[-1]
    # Numerically-stable softmax over -cost along the lane-minor D axis.
    logits = -cost
    if temperature != 1.0:
        logits = logits / jnp.asarray(temperature, cost.dtype)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    weights = jnp.exp(logits)
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    disps = jnp.arange(d, dtype=cost.dtype)
    return jnp.sum(weights * disps, axis=-1)
