"""1-D stereo correlation cost volume (north-star hot-op #2; SURVEY C10).

``cost[b, h, w, d] = mean_c( F_L[b, h, w, c] * F_R[b, h, w - d, c] )``
for d in [0, D). Out-of-frame right-view samples contribute zero (the
DispNetC/FADNet zero-padding convention — UNVERIFIED vs reference, the
mount was empty; see SURVEY §2 C10).

Layout: features NHWC, cost volume (B, H, W, D) with the disparity axis
lane-minor — the aggregation network consumes D as its channel axis so
the volume feeds channels-last convs with no transpose.

Two implementations behind ``use_pallas``:

* ``_correlation_jnp`` — shift-and-reduce reference (the unit-test
  oracle; SURVEY §4.2). Static Python loop over D so XLA sees D fused
  elementwise multiply-reduces it can vectorize on the VPU.
* ``_correlation_pallas`` — the flagship Pallas TPU kernel
  (kernels live in ops/pallas/correlation.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# None = auto: use the Pallas kernel on TPU, the jnp oracle elsewhere.
# Measured on v5e at config-5 shape (B16 H96 W288 C64 D48):
# XLA 16.01 ms vs Pallas 11.30 ms (1.42x), max|diff| 1.2e-7 (bench log in
# BASELINE.md).
_USE_PALLAS: bool | None = None

# bf16 inputs take the tiled-Gram MXU formulation instead (round 3):
# measured 2.77 vs 5.73 ms at config-5 b16 (2.1x) and 0.47 vs 0.86 at
# b2 — see _correlation_gram. None = auto (bf16 → Gram).
_USE_GRAM: bool | None = None


def set_use_pallas(flag: bool | None) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


def set_use_gram(flag: bool | None) -> None:
    global _USE_GRAM
    _USE_GRAM = flag


def correlation1d(
    f_left: jnp.ndarray,
    f_right: jnp.ndarray,
    max_disp: int,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Build the (B, H, W, D) cost volume, D = max_disp."""
    if f_left.shape != f_right.shape:
        raise ValueError(f"shape mismatch {f_left.shape} vs {f_right.shape}")
    use_gram = _USE_GRAM
    if use_gram is None:
        use_gram = f_left.dtype == jnp.bfloat16
    if use_gram:
        return _correlation_gram(f_left, f_right, max_disp)
    use = _USE_PALLAS if use_pallas is None else use_pallas
    if use is None:
        use = jax.default_backend() == "tpu"
    if use:
        return _correlation_pallas_op(f_left, f_right, max_disp)
    return _correlation_jnp(f_left, f_right, max_disp)


# W-tile for the Gram formulation: T=64 measured fastest on v5e
# (T32 3.05 / T64 2.77 / T96 4.22 / T128 5.62 ms at config-5 b16 bf16 —
# band waste (T+D-1)/D vs MXU M-dim fill trade).
_GRAM_T = 64


def _correlation_gram(
    f_left: jnp.ndarray, f_right: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    """Tiled banded-Gram correlation on the MXU — pure XLA (round 3).

    Both the v1 Pallas kernel and the jnp oracle are VPU-bound: D
    cross-lane reduction sweeps dominate (~5.7 ms for 2.7 GFLOP at
    config-5 b16). This formulation rides the MXU instead: tile W into
    T-wide blocks, compute each block's banded Gram against its
    (T+D-1)-wide right-view window in ONE batched dot_general, then
    extract the sheared band WITHOUT gathers or per-row rolls — the
    band G[u, (T-1) - u + d] lives at flat index (T-1) + u*(Tw-1) + d
    of the row-major Gram block (Tw = T+D-1), i.e. it is a plain
    slice + reshape with stride Tw-1, which XLA lowers to one tiled
    copy. (A Pallas masked-roll shear of the same Gram was measured at
    6.45 ms — Mosaic's variable lane-rotations cost more than the VPU
    reductions they replace; ops/pallas/correlation_v3.py keeps that
    experiment.)

    The Gram is emitted in the INPUT dtype: for bf16 serving this adds
    only the MXU's bf16 product rounding (max|cost diff| ~2e-3 on
    unit-normal features) to a path that already casts the cost volume
    to bf16 for aggregation. fp32 inputs at HIGHEST precision are exact
    vs the oracle (1.2e-7) but measured slower than the Pallas kernel
    at b16 (7.6 vs 6.7 ms) — so the fp32 path keeps v1 and this runs
    for bf16 (where it wins at every batch measured: 2.1x at b16,
    1.8x at b2). Pure XLA: differentiable and GSPMD-partitionable with
    no custom VJP / custom_partitioning machinery.
    """
    b, h, w, c = f_left.shape
    d = max_disp
    t = _GRAM_T
    bh = b * h
    nt = -(-w // t)
    wt = nt * t
    tw = t + d - 1
    # Right-pad FL's W to the tile grid (zero rows → zero cost, sliced
    # off at the end).
    fl = jnp.pad(f_left.reshape(bh, w, c), ((0, 0), (0, wt - w), (0, 0)))
    flt = fl.reshape(bh, nt, t, c)
    # FRpad[p] = F_R[p - (D-1)]; right-padded so every window is in range.
    fr = jnp.pad(
        f_right.reshape(bh, w, c), ((0, 0), (d - 1, wt - w), (0, 0))
    )
    # Per-tile REVERSED windows (one fused gather copy, 1.4x of F_R):
    # frw[:, t0, j, :] = FRpad[t0*T + (Tw-1-j)].
    frw = jnp.stack(
        [fr[:, t0 * t : t0 * t + tw, :][:, ::-1, :] for t0 in range(nt)],
        axis=1,
    )  # (BH, nt, Tw, C)
    g = jax.lax.dot_general(
        flt,
        frw,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=f_left.dtype,
    )  # (BH, nt, T, Tw): G[u, j] = Σ_c FL[t0*T+u, c] · FRpad[t0*T + Tw-1-j, c]
    # cost[x, d'] = FL[x]·FRpad[x + (D-1) - d'] → j = (T-1) - u + d':
    # flat index u*Tw + (T-1) - u + d' = (T-1) + u*(Tw-1) + d'.
    gf = g.reshape(bh, nt, t * tw)
    band = jax.lax.slice(gf, (0, 0, t - 1), (bh, nt, t - 1 + t * (tw - 1)))
    band = band.reshape(bh, nt, t, tw - 1)[..., :d]
    cost = band.astype(jnp.float32) * (1.0 / c)
    return cost.reshape(bh, wt, d)[:, :w].reshape(b, h, w, d)


# --------------------------------------------------------------------------
# Pallas forward + analytic backward (Pallas kernels have no automatic
# VJP — without this, stereo TRAINING fails on TPU while inference works;
# caught by driving the selfsup train step on the real chip).
#
#   cost[w, d]   = 1/C Σ_c  fl[w, c] · fr[w-d, c]
#   ∂L/∂fl[w, c] = 1/C Σ_d  g[w, d]  · fr[w-d, c]      (shift fr right)
#   ∂L/∂fr[w, c] = 1/C Σ_d  g[w+d, d]· fl[w+d, c]      (shift g·fl left)
# --------------------------------------------------------------------------


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _correlation_pallas_op(f_left, f_right, max_disp: int):
    from scenedepthestimation_tpu.ops.pallas.correlation import (
        correlation_pallas,
    )

    return correlation_pallas(f_left, f_right, max_disp)


def _corr_fwd(f_left, f_right, max_disp: int):
    return _correlation_pallas_op(f_left, f_right, max_disp), (f_left, f_right)


def _corr_bwd(max_disp: int, residuals, g):
    f_left, f_right = residuals
    b, h, w, c = f_left.shape
    inv_c = 1.0 / c
    g = g.astype(jnp.float32)
    fl = f_left.astype(jnp.float32)
    fr = f_right.astype(jnp.float32)

    fr_pad = jnp.pad(fr, ((0, 0), (0, 0), (max_disp - 1, 0), (0, 0)))
    d_fl = jnp.zeros_like(fl)
    d_fr = jnp.zeros_like(fr)
    for d in range(max_disp):
        start = max_disp - 1 - d
        fr_d = fr_pad[:, :, start : start + w, :]  # fr shifted right by d
        g_d = g[..., d : d + 1]  # (B, H, W, 1)
        d_fl = d_fl + g_d * fr_d
        # scatter g_d·fl back to fr positions w-d  ≡  shift left by d
        contrib = g_d * fl
        shifted = jnp.pad(contrib, ((0, 0), (0, 0), (0, d), (0, 0)))[:, :, d:, :]
        d_fr = d_fr + shifted
    return (
        (d_fl * inv_c).astype(f_left.dtype),
        (d_fr * inv_c).astype(f_right.dtype),
    )


_correlation_pallas_op.defvjp(_corr_fwd, _corr_bwd)


def _correlation_jnp(
    f_left: jnp.ndarray, f_right: jnp.ndarray, max_disp: int
) -> jnp.ndarray:
    b, h, w, c = f_left.shape
    inv_c = 1.0 / c
    # Pad the right features once on the left of W; slice per shift.
    fr_pad = jnp.pad(f_right, ((0, 0), (0, 0), (max_disp - 1, 0), (0, 0)))
    slices = []
    for d in range(max_disp):
        # Static slice == F_R shifted right by d with zero fill.
        start = max_disp - 1 - d
        fr_d = fr_pad[:, :, start : start + w, :]
        slices.append(jnp.sum(f_left * fr_d, axis=-1) * inv_c)
    return jnp.stack(slices, axis=-1)
