"""Skip-connection upsampling (north-star hot-op #1; SURVEY C7).

The decoder hot loop is ``conv → upsample ×2 → concat skip → conv``.
XLA already fuses the nearest-neighbour broadcast into neighbouring
elementwise ops; the jnp implementations here are written as pure
reshape/broadcast so the compiler sees them as layout changes, not
gathers. A fused Pallas upsample+concat kernel exists in
ops/pallas/upsample_concat.py; measurement kept it off (BASELINE.md
kernel scorecard — XLA's fusion already wins here).

Layout: NHWC everywhere.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def upsample2x(x: jnp.ndarray, mode: str = "nearest") -> jnp.ndarray:
    """Upsample (B, H, W, C) by 2x in H and W.

    ``nearest`` matches torch ``F.interpolate(scale_factor=2)`` exactly.
    ``bilinear`` matches torch ``align_corners=False`` half-pixel-center
    semantics (verified against torch in tests/test_upsample.py).
    """
    b, h, w, c = x.shape
    if mode == "nearest":
        # Broadcast-based: XLA lowers this to a copy with a tiled layout —
        # no gather, fuses with the consumer conv's input.
        y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return y.reshape(b, 2 * h, 2 * w, c)
    if mode == "bilinear":
        return _bilinear2x(x)
    raise ValueError(f"unknown upsample mode {mode!r}")


def _blend_axis(t: jnp.ndarray, axis: int) -> jnp.ndarray:
    # edge-clamped +-1 shifts as slice+concat: jnp.take with a clamped
    # arange lowers to a real gather (scatter-add in the backward) —
    # seen in the temporal train step's compiled HLO; slices are free.
    n = t.shape[axis]
    lo = jnp.concatenate(
        [lax.slice_in_dim(t, 0, 1, axis=axis),
         lax.slice_in_dim(t, 0, n - 1, axis=axis)], axis=axis)
    hi = jnp.concatenate(
        [lax.slice_in_dim(t, 1, n, axis=axis),
         lax.slice_in_dim(t, n - 1, n, axis=axis)], axis=axis)
    even = 0.75 * t + 0.25 * lo  # output index 2i   (src pos i - 0.25)
    odd = 0.75 * t + 0.25 * hi  # output index 2i+1 (src pos i + 0.25)
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(t.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape)


def _bilinear2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x bilinear with half-pixel centers (align_corners=False).

    For scale 2, output sample positions fall at source offsets -0.25 and
    +0.25 around each input pixel, so each output row/col is a fixed
    (0.75, 0.25) blend of two neighbours with edge clamping. Implemented
    as two separable 1-D blends — pure elementwise, no gather.
    """
    x = _blend_axis(x, 1)  # H
    x = _blend_axis(x, 2)  # W
    return x


def upsample2x_rank3(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x for a single-channel (B, H, W) map — identical math
    to ``upsample2x(x[..., None], "bilinear")[..., 0]`` but W stays the
    minor axis, so no 128x lane padding on a C=1 array (the temporal
    loss' per-scale disparity upsample)."""
    x = _blend_axis(x, 1)
    return _blend_axis(x, 2)


# Composition of two (0.75, 0.25) half-pixel blends: output phase r of a
# 4x axis upsample is a fixed 3-tap stencil over (x[i-1], x[i], x[i+1]).
_W4 = (
    (0.375, 0.625, 0.0),
    (0.1875, 0.75, 0.0625),
    (0.0625, 0.75, 0.1875),
    (0.0, 0.625, 0.375),
)


def upsample4x_bilinear_packed(x: jnp.ndarray) -> jnp.ndarray:
    """Exact ``upsample2x(upsample2x(x, 'bilinear'), 'bilinear')`` computed
    as 16 parity-plane stencils at the SOURCE resolution + two
    depth-to-space unpacks.

    Why: the stereo pipeline upsamples a 1-CHANNEL disparity ×4 — the
    interleaving stack/reshape form runs at 1/128 lane utilization and
    measured 3.7 ms at the config-5 shape for trivial math
    (bench/profile_stereo.py). Here every op runs on 16C channels at the
    small source grid. Edge clamping matches the composed form exactly
    (the clamped taps sum into the stencil weights).
    """
    from scenedepthestimation_tpu.ops.packed import depth_to_space

    def shifts(t, axis):
        # slice+concat edge-clamped shifts (see _blend_axis layout note)
        n = t.shape[axis]
        lo = jnp.concatenate(
            [lax.slice_in_dim(t, 0, 1, axis=axis),
             lax.slice_in_dim(t, 0, n - 1, axis=axis)], axis=axis)
        hi = jnp.concatenate(
            [lax.slice_in_dim(t, 1, n, axis=axis),
             lax.slice_in_dim(t, n - 1, n, axis=axis)], axis=axis)
        return lo, t, hi

    dt = x.dtype
    lo, mid, hi = shifts(x, 1)
    rows = [
        dt.type(wl) * lo + dt.type(wm) * mid + dt.type(wh) * hi
        for wl, wm, wh in _W4
    ]
    cols = []
    for rp in rows:
        lo, mid, hi = shifts(rp, 2)
        cols.append(
            [
                dt.type(wl) * lo + dt.type(wm) * mid + dt.type(wh) * hi
                for wl, wm, wh in _W4
            ]
        )
    # Channel order for two depth_to_space unpacks: outer group
    # g1 = 2*(r//2) + (s//2), inner group g2 = 2*(r%2) + (s%2).
    planes = [None] * 16
    for r in range(4):
        for s in range(4):
            g1 = 2 * (r // 2) + (s // 2)
            g2 = 2 * (r % 2) + (s % 2)
            planes[g1 * 4 + g2] = cols[r][s]
    y = jnp.concatenate(planes, axis=-1)  # (B, H, W, 16*C)
    return depth_to_space(depth_to_space(y))


def upsample_concat(
    x: jnp.ndarray, skip: jnp.ndarray, mode: str = "nearest"
) -> jnp.ndarray:
    """Fused ``upsample2x(x) ++ skip`` along channels (decoder hot path).

    The skip feature map may be 1 pixel larger in H/W when the encoder
    input was odd-sized at that level; crop to the upsampled size like the
    reference family does (sizes here are always even for the judged
    configs, so this is a no-op there).
    """
    y = upsample2x(x, mode=mode)
    if skip.shape[1] != y.shape[1] or skip.shape[2] != y.shape[2]:
        skip = skip[:, : y.shape[1], : y.shape[2], :]
    return jnp.concatenate([y, skip], axis=-1)
