"""On-device preprocessing (SURVEY C2; north-star: "preprocessing ...
becomes a jit-compiled XLA program" — BASELINE.json:5).

The host decodes compressed bytes to uint8 arrays (data/io.py) and never
touches pixel tensors again: uint8 frames are device_put and everything
below — dtype cast, /255 scaling, antialiased bilinear resize, mean/std
normalization — runs inside the jitted program.

Resize parity (SURVEY §7 "Hard parts"): ``jax.image.resize`` with
``method="bilinear", antialias=True`` implements the same triangle-filter
resampling as PIL's BILINEAR and torch's ``interpolate(..., antialias=
True)`` (half-pixel centers, kernel widened by the scale factor on
downsample). tests/test_preprocess.py pins the parity tolerance.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.configs import PreprocessConfig


def to_float(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] (or float already in [0,1]) → float32 [0,1]."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) * (1.0 / 255.0)
    return img.astype(jnp.float32)


def resize_bilinear(
    img: jnp.ndarray, out_hw: Tuple[int, int], antialias: bool = True
) -> jnp.ndarray:
    """Resize (..., H, W, C) float image to (..., out_h, out_w, C)."""
    out_shape = img.shape[:-3] + (out_hw[0], out_hw[1], img.shape[-1])
    return jax.image.resize(
        img, out_shape, method="bilinear", antialias=antialias
    )


def normalize(
    img: jnp.ndarray,
    mean: Sequence[float],
    std: Sequence[float],
) -> jnp.ndarray:
    mean_a = jnp.asarray(mean, dtype=img.dtype)
    inv_std = 1.0 / jnp.asarray(std, dtype=img.dtype)
    return (img - mean_a) * inv_std


def preprocess(
    img: jnp.ndarray,
    out_hw: Tuple[int, int],
    cfg: PreprocessConfig = PreprocessConfig(),
    compute_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Full C2 chain: uint8 frame(s) → normalized network input.

    Accepts (H, W, 3) or (B, H, W, 3); resize happens in fp32 regardless
    of compute dtype (bf16 resampling weights cost abs-rel), the final
    cast to ``compute_dtype`` is last.
    """
    x = to_float(img)
    if x.shape[-3:-1] != tuple(out_hw):
        x = resize_bilinear(x, out_hw, antialias=cfg.antialias)
    x = normalize(x, cfg.mean, cfg.std)
    return x.astype(compute_dtype)
