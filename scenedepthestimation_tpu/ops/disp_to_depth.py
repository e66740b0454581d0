"""Disparity→depth conversion (north-star hot-op #4; SURVEY C8).

Two conversions, both pure elementwise functions on device tensors:

* Monocular (monodepth2-lineage scaled-sigmoid inversion):
  ``scaled = min_disp + (max_disp - min_disp) * sigmoid_out``,
  ``depth = 1 / scaled`` with ``min_disp = 1/max_depth``,
  ``max_disp = 1/min_depth``. Constants live in configs.MonoConfig
  (UNVERIFIED vs reference — the mount was empty; monodepth2 defaults).
* Stereo: ``depth = focal_px * baseline_m / disparity_px``.

These are trivially fused by XLA into the producing kernel's epilogue;
they are kept as named functions so the Pallas soft-argmin kernel can
inline the stereo variant as its epilogue (SURVEY C12 note).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def disp_to_depth(
    disp: jnp.ndarray, min_depth: float = 0.1, max_depth: float = 100.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Convert sigmoid network output in [0,1] to (scaled_disp, depth)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_from_disparity(
    disp_px: jnp.ndarray, focal_px: float, baseline_m: float, eps: float = 1e-6
) -> jnp.ndarray:
    """Stereo pinhole conversion: depth[m] = f[px] * B[m] / disp[px]."""
    return focal_px * baseline_m / jnp.maximum(disp_px, eps)


def sigmoid_disp_from_depth(
    depth, min_depth: float = 0.1, max_depth: float = 100.0, eps: float = 1e-6
):
    """Inverse of :func:`disp_to_depth`: metric depth → the network's
    [0, 1] sigmoid-disparity units (supervised mono GT encoding,
    train.make_mono_train_step's ``gt_disp`` contract).

    Non-positive depth means INVALID and maps to exactly 0 (the loss
    mask convention); valid depth is clamped into [min_depth, max_depth]
    and floored at ``eps`` so a pixel AT max_depth stays distinguishable
    from invalid. Works on NumPy arrays (host-side feed path) and jnp
    arrays alike — pure ufunc arithmetic.
    """
    import numpy as np

    xp = jnp if isinstance(depth, jnp.ndarray) else np
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    d = xp.clip(depth, min_depth, max_depth)
    sig = (1.0 / d - min_disp) / (max_disp - min_disp)
    return xp.where(depth > 0, xp.maximum(sig, eps), 0.0)
