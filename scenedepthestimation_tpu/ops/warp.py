"""Disparity-based horizontal image warping (view synthesis for
self-supervised photometric training — SURVEY C14's "photometric" half).

``warp_horizontal(right, disp)`` samples the right view at
``x - disp(x)`` to reconstruct the left view. Rectified stereo means the
sample is 1-D along W: implemented as a gather of the two neighbouring
columns + lerp — jit/grad-friendly (gradients flow into ``disp``), no
scatter, static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def warp_horizontal(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W, C), disp (B, H, W) in px (positive = sample left).

    Returns img sampled at x' = x - disp, bilinear along W, edge-clamped.
    Out-of-frame samples clamp to the border column (mask with
    ``valid_mask_horizontal`` when training).
    """
    b, h, w, c = img.shape
    x = jnp.arange(w, dtype=disp.dtype)[None, None, :]  # (1, 1, W)
    src = x - disp  # (B, H, W)
    src = jnp.clip(src, 0.0, w - 1.0)
    x0 = jnp.floor(src)
    frac = (src - x0)[..., None]  # (B, H, W, 1)
    i0 = x0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w - 1)
    # take_along_axis over axis 2 with (B, H, W) indices broadcast over C:
    left = jnp.take_along_axis(img, jnp.broadcast_to(i0[..., None], (b, h, w, c)), axis=2)
    right = jnp.take_along_axis(img, jnp.broadcast_to(i1[..., None], (b, h, w, c)), axis=2)
    return left * (1.0 - frac) + right * frac


def valid_mask_horizontal(disp: jnp.ndarray, width: int) -> jnp.ndarray:
    """True where x - disp lands inside the frame."""
    x = jnp.arange(width, dtype=disp.dtype)[None, None, :]
    src = x - disp
    return (src >= 0.0) & (src <= width - 1.0)
