"""Depth/disparity colormap for dumps (reference-family 'magma' dumps).

A self-contained 16-anchor magma approximation (no matplotlib dependency)
linearly interpolated to 256 entries; input is min-max normalized.
"""

from __future__ import annotations

import numpy as np

_MAGMA_ANCHORS = np.array(
    [
        (0.001462, 0.000466, 0.013866),
        (0.078815, 0.054184, 0.211667),
        (0.198177, 0.063917, 0.404009),
        (0.316654, 0.071690, 0.485380),
        (0.428768, 0.110328, 0.494813),
        (0.537755, 0.156274, 0.478950),
        (0.645633, 0.201310, 0.446213),
        (0.752312, 0.254627, 0.401685),
        (0.849786, 0.329431, 0.349171),
        (0.923215, 0.434205, 0.331783),
        (0.965024, 0.559118, 0.391090),
        (0.986700, 0.678016, 0.484123),
        (0.996096, 0.792167, 0.600336),
        (0.997325, 0.905157, 0.731443),
        (0.992237, 0.948318, 0.740434),
        (0.987053, 0.991438, 0.749504),
    ],
    dtype=np.float32,
)


def _build_lut() -> np.ndarray:
    xs = np.linspace(0.0, 1.0, len(_MAGMA_ANCHORS))
    grid = np.linspace(0.0, 1.0, 256)
    lut = np.stack(
        [np.interp(grid, xs, _MAGMA_ANCHORS[:, c]) for c in range(3)], axis=-1
    )
    return (lut * 255.0 + 0.5).astype(np.uint8)


_LUT = _build_lut()


def colormap_magma(x: np.ndarray) -> np.ndarray:
    """(H, W) scalar map → (H, W, 3) uint8 RGB, min-max normalized."""
    x = np.asarray(x, dtype=np.float32)
    lo, hi = float(x.min()), float(x.max())
    norm = (x - lo) / (hi - lo + 1e-9)
    idx = np.clip((norm * 255.0).astype(np.int32), 0, 255)
    return _LUT[idx]
