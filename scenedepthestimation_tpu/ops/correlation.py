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


def set_use_pallas(flag: bool | None) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


def correlation1d(
    f_left: jnp.ndarray,
    f_right: jnp.ndarray,
    max_disp: int,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Build the (B, H, W, D) cost volume, D = max_disp."""
    if f_left.shape != f_right.shape:
        raise ValueError(f"shape mismatch {f_left.shape} vs {f_right.shape}")
    use = _USE_PALLAS if use_pallas is None else use_pallas
    if use is None:
        use = jax.default_backend() == "tpu"
    if use:
        return _correlation_pallas_op(f_left, f_right, max_disp)
    return _correlation_jnp(f_left, f_right, max_disp)


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
