"""Space-to-depth stem convolution (round-3 encoder lever).

A stride-2 conv on an RGB input (C=3) starves the MXU's contraction
dimension (K_eff = kw*3), which is why the ResNet 7x7 stem measured
~32 TF/s (8.27 ms of the ~32 ms encoder at the judged b128 shape —
bench/probe_stem, probe_stem2). Packing 2x2 input pixels into channels
(space-to-depth x2) re-expresses the SAME linear map as a stride-1 conv
on C=12 with a derived kernel:

    out[i,j] = sum_{u,v} k[u+p, v+p] x[2i+u, 2j+v]        (stride 2, pad p)
             = sum_{a,b} K'[a,b] xp[i-t+a, j-t+b]         (stride 1)

    K'[a, b, (dy*2+dx)*C + c, o] = k_pad[2a+dy, 2b+dx, c, o]

where k_pad zero-pads the odd-sized kernel to even length (top for 7x7,
bottom for 5x5 — fixed by requiring u = 2a+dy-(p+t_k) to cover [-p, p])
and xp is the s2d-packed input with zero padding (t, 1) per spatial dim.
Packed zeros coincide with the original zero padding, so the rewrite is
EXACT (a permutation of the same sum).  K' is the s2d of the padded
kernel over its spatial dims — the build-time transform is one pad +
reshape.

FLOP cost: 4C*A^2 vs C*k^2 taps (7x7: 192 vs 147 = 1.31x; 5x5: 108 vs
75 = 1.44x). MEASURED RESULT (bench/probe_stem2, BASELINE.md round 3):
DECLINED — 6.47 ms vs 5.26 std at the judged b128 shape. The packed
C=12 tensor under-fills the 128-lane tiles exactly as C=3 does, and
the packing pass costs a full read+write of the input; the stem is
layout-bound, not contraction-bound, on this hardware. Kept in-tree
(exact, tested, `MonoConfig.s2d_stem` default OFF) as the recorded
experiment.

Covers SURVEY C6's stem (ResNet conv1, 7x7 s2) and C9's tower stem
(FeatureTower.down1, 5x5 s2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")

# kernel size -> (kernel zero-pad (top, bottom), packed input pad (lo, hi))
_S2D_PLAN = {7: ((1, 0), (2, 1)), 5: ((0, 1), (1, 1))}


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h // 2, 2, w // 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h // 2, w // 2, 4 * c)
    )


def s2d_stem_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(kk, kk, C, Co) stride-2 kernel -> (A, A, 4C, Co) stride-1 kernel.

    The derived kernel is the spatial s2d of the zero-padded original —
    channel order (dy, dx, c) matching :func:`space_to_depth2`.
    """
    kk = k.shape[0]
    (lo, hi), _ = _S2D_PLAN[kk]
    kp = jnp.pad(k, ((lo, hi), (lo, hi), (0, 0), (0, 0)))
    m, _, c, co = kp.shape  # m = kk + 1, even
    a = m // 2
    return (
        kp.reshape(a, 2, a, 2, c, co)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(a, a, 4 * c, co)
    )


def s2d_stem_conv(
    x: jnp.ndarray, k_s2d: jnp.ndarray, kernel_size: int
) -> jnp.ndarray:
    """Stride-2 conv (zero pad k//2) via the s2d rewrite.

    ``k_s2d`` is :func:`s2d_stem_kernel` of the original kernel; ``x``
    is the UNPACKED input (H, W even). Equals
    ``lax.conv(x, k, stride 2, pad k//2)`` exactly.
    """
    _, pad = _S2D_PLAN[kernel_size]
    return lax.conv_general_dilated(
        space_to_depth2(x),
        k_s2d,
        window_strides=(1, 1),
        padding=(pad, pad),
        dimension_numbers=DN,
    )
