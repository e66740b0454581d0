"""Bordered-carry execution of the collapsed mono tail (round 3).

The round-3 pad-elimination (ops/collapsed.py conv3x3_nopad and
friends) made every edge/reflect-bordered conv exact without
materialized pads, but each op still pays an ASSEMBLY: the recomputed
border strips are concatenated back around the interior, which rewrites
the full (multi-GB at b128) tensor once per op. A ceiling probe with
every border replaced by plain zero padding (numerically wrong at the
1-px borders) measured **1822 fps vs the exact 1507** — ~15 ms/iter of
border machinery, concentrated in the (192,576)-grid tail ops
(bench/probe_border_cost.py has the per-op split).

This module removes the per-op assembly by CARRYING the borders:

    Bordered(mid, top, bot, left, right)

* ``mid``   — full-size tensor computed with plain zero-pad convs; its
  outer ``w``-wide frame is garbage (w grows by 1 per 3x3 conv, x2 per
  depth_to_space).
* ``top/bot`` — exact rows [0, w) / [H-w, H), FULL width (corner-exact).
* ``left/right`` — exact cols [0, w) / [W-w, W), FULL height.

Each op maps all five parts: the mid conv is a plain zero-pad conv (the
fast form the ceiling measured), the band convs are thin full-width /
full-height convs with true edge/reflect pads materialized on the small
band (cheap), fed by the band plus a 2-row/2-col exact halo assembled
from the neighboring parts. ONE final assembly (two concats on the
small packed-logits tensor) replaces the ~10 per-op assemblies.

Exactness: every band input row/col is exact by the invariant, and the
band convs use the same pad semantics as the v2 strip forms
(tests/test_bordered.py pins the tail against the module path).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.packed import depth_to_space
from scenedepthestimation_tpu.ops.upsample import upsample2x

DN = ("NHWC", "HWIO", "NHWC")


class Bordered(NamedTuple):
    mid: jnp.ndarray  # (B, H, W, C), outer w-frame garbage
    top: jnp.ndarray  # (B, w, W, C) exact
    bot: jnp.ndarray  # (B, w, W, C) exact
    left: jnp.ndarray  # (B, H, w, C) exact
    right: jnp.ndarray  # (B, H, w, C) exact

    @property
    def w(self) -> int:
        return self.top.shape[1]


def _conv(x, k, strides=(1, 1), padding="VALID"):
    return lax.conv_general_dilated(
        x, k, strides, padding, dimension_numbers=DN
    )


def _rows(bt: Bordered, a: int, b: int) -> jnp.ndarray:
    """Exact rows [a, b) at full width (requires w <= a, b <= H - w)."""
    w, wd = bt.w, bt.mid.shape[2]
    return jnp.concatenate(
        [bt.left[:, a:b], bt.mid[:, a:b, w : wd - w], bt.right[:, a:b]],
        axis=2,
    )


def _cols(bt: Bordered, a: int, b: int) -> jnp.ndarray:
    """Exact cols [a, b) at full height (requires w <= a, b <= W - w)."""
    w, h = bt.w, bt.mid.shape[1]
    return jnp.concatenate(
        [bt.top[:, :, a:b], bt.mid[:, w : h - w, a:b], bt.bot[:, :, a:b]],
        axis=1,
    )


def bordered_map(fn: Callable, bt: Bordered) -> Bordered:
    """Apply an elementwise fn to all five parts."""
    return Bordered(*(fn(p) for p in bt))


def bordered_from_exact(x: jnp.ndarray) -> Bordered:
    """Wrap an exact tensor as a Bordered with w = 0 (empty bands)."""
    return Bordered(
        mid=x,
        top=x[:, :0],
        bot=x[:, :0],
        left=x[:, :, :0],
        right=x[:, :, :0],
    )


def bordered_add(a: Bordered, b: Bordered) -> Bordered:
    """Part-wise sum (widths must match — widen first)."""
    return Bordered(*(pa + pb for pa, pb in zip(a, b)))


def bordered_widen(bt: Bordered, w_new: int) -> Bordered:
    """Grow the exact bands to ``w_new`` from the (exact) mid interior."""
    w = bt.w
    if w_new == w:
        return bt
    h, wd = bt.mid.shape[1], bt.mid.shape[2]
    return Bordered(
        mid=bt.mid,
        top=jnp.concatenate([bt.top, _rows(bt, w, w_new)], axis=1),
        bot=jnp.concatenate([_rows(bt, h - w_new, h - w), bt.bot], axis=1),
        left=jnp.concatenate([bt.left, _cols(bt, w, w_new)], axis=2),
        right=jnp.concatenate(
            [_cols(bt, wd - w_new, wd - w), bt.right], axis=2
        ),
    )


def bordered_upsample_concat(
    bt: Bordered, skip: jnp.ndarray, mode: str = "nearest"
) -> Bordered:
    """``concat([upsample2x(bt), skip], -1)`` — skip is EXACT, so its
    band slices join the (doubled-width) upsampled bands directly."""
    w2 = 2 * bt.w
    up = bordered_map(lambda p: upsample2x(p, mode=mode), bt)
    return Bordered(
        mid=jnp.concatenate([up.mid, skip], axis=-1),
        top=jnp.concatenate([up.top, skip[:, :w2]], axis=-1),
        bot=jnp.concatenate([up.bot, skip[:, skip.shape[1] - w2 :]], axis=-1),
        left=jnp.concatenate([up.left, skip[:, :, :w2]], axis=-1),
        right=jnp.concatenate(
            [up.right, skip[:, :, skip.shape[2] - w2 :]], axis=-1
        ),
    )


def bordered_conv3x3(
    bt: Bordered,
    k: jnp.ndarray,
    mode: str = "edge",
    mid_conv: Optional[Callable] = None,
    band_k: Optional[jnp.ndarray] = None,
) -> Bordered:
    """3x3 stride-1 conv with ``mode`` borders on a bordered tensor.

    ``mid_conv`` overrides the interior conv (e.g. the column-packed
    disparity head); ``band_k`` overrides the kernel used for the band
    convs (e.g. the unpacked head kernel when mid runs colpacked).
    w grows by 1.
    """
    w = bt.w
    h, wd = bt.mid.shape[1], bt.mid.shape[2]
    kb = k if band_k is None else band_k
    mid = mid_conv(bt.mid) if mid_conv is not None else _conv(
        bt.mid, k, padding=((1, 1), (1, 1))
    )

    def band_h(x, hpad):  # thin full-width band, H: (1,0)/(0,1)+VALID
        return _conv(
            jnp.pad(x, ((0, 0), hpad, (1, 1), (0, 0)), mode=mode), kb
        )

    def band_w(x, wpad):  # thin full-height band, W: (1,0)/(0,1)+VALID
        return _conv(
            jnp.pad(x, ((0, 0), (1, 1), wpad, (0, 0)), mode=mode), kb
        )

    top = band_h(
        jnp.concatenate([bt.top, _rows(bt, w, w + 2)], axis=1), (1, 0)
    )
    bot = band_h(
        jnp.concatenate([_rows(bt, h - w - 2, h - w), bt.bot], axis=1),
        (0, 1),
    )
    left = band_w(
        jnp.concatenate([bt.left, _cols(bt, w, w + 2)], axis=2), (1, 0)
    )
    right = band_w(
        jnp.concatenate([_cols(bt, wd - w - 2, wd - w), bt.right], axis=2),
        (0, 1),
    )
    return Bordered(mid, top, bot, left, right)


def bordered_d2s(bt: Bordered) -> Bordered:
    """depth_to_space all parts: H, W, and w double; C /= 4."""
    return Bordered(*(depth_to_space(p) for p in bt))


def bordered_assemble(bt: Bordered) -> jnp.ndarray:
    """One exact tensor: two concats on the final (small) output."""
    w = bt.w
    h, wd = bt.mid.shape[1], bt.mid.shape[2]
    m = jnp.concatenate([bt.top, bt.mid[:, w : h - w], bt.bot], axis=1)
    return jnp.concatenate(
        [bt.left, m[:, :, w : wd - w], bt.right], axis=2
    )


def _skip_bordered(f0: jnp.ndarray, k_skip: jnp.ndarray) -> Bordered:
    """``strided_skip(f0, k_skip)`` (stride-2 4x4, own-res REFLECT pad
    (1,2)) as a Bordered with w=1 — band math mirrors
    ops/collapsed.strided_skip_conv_v2."""
    mid = _conv(f0, k_skip, strides=(2, 2), padding=((1, 2), (1, 2)))

    def s_strip(sl, pad):
        return _conv(
            jnp.pad(sl, ((0, 0), *pad, (0, 0)), mode="reflect"),
            k_skip,
            strides=(2, 2),
        )

    return Bordered(
        mid=mid,
        top=s_strip(f0[:, :3], ((1, 0), (1, 1))),
        bot=s_strip(f0[:, -3:], ((0, 1), (1, 1))),
        left=s_strip(f0[:, :, :3], ((1, 1), (1, 0))),
        right=s_strip(f0[:, :, -3:], ((1, 1), (0, 1))),
    )


def bordered_y1p(
    t, f0: jnp.ndarray, k_col: jnp.ndarray, k_skip: jnp.ndarray
) -> Bordered:
    """Level-1 entry: ``edge_conv(t, k_col) + strided_skip(f0, k_skip)``.

    ``t`` — exact array or Bordered — carries EDGE borders (the collapse
    image of the full-res reflect); ``f0`` (B, H/2, W/2, c0f) is exact.
    Output width = t.w + 1.
    """
    if not isinstance(t, Bordered):
        t = bordered_from_exact(t)
    col = bordered_conv3x3(t, k_col, mode="edge")
    return bordered_add(col, bordered_widen(_skip_bordered(f0, k_skip), col.w))
