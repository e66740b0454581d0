"""Collapsed-upsample execution of the decoder's finest levels — the
round-2 successor to the plain space-to-depth rewrite of ops/packed.py.

Why packing alone was a wash (measured, BASELINE.md round-2 notes): a
s2d-packed 3x3 conv carries 4x the FLOPs (3/4 of the packed kernel is
structural zeros) at 4x the lane utilization — MXU time is unchanged,
and HBM bytes are identical, so only the small-copy overheads moved.

The collapse: the decoder upsamples with NEAREST interpolation, so the
full-res conv input U = upsample2x(z) satisfies U[r, s] = z[r//2, s//2].
For output pixel (2p+a, 2q+b):

    y[2p+a, 2q+b] = sum_{dy,dx} k[dy+1, dx+1] * z[(2p+a+dy)//2, (2q+b+dx)//2]

and the row index (2p+a+dy)//2 only takes TWO values: {p-1, p} for a=0,
{p, p+1} for a=1 — taps that hit the same source pixel MERGE by
linearity (k[1]+k[2] for a=0, k[0]+k[1] for a=1; same for columns). The
whole ``conv3x3 ∘ upsample2x`` therefore equals ONE 3x3 conv on the
HALF-RES z with a derived (3, 3, C, 4*Co) kernel whose output channels
are the four spatial parity groups — i.e. it directly produces the
space-to-depth packing of the full-res result:

  * FLOPs: identical to the original full-res conv (the 4x tiling
    redundancy of plain packing is what collapses);
  * lane utilization: 4x (Co=16 -> 64 output lanes);
  * bandwidth: no full-res tensor is ever materialized — the upsample,
    its (H, W, C) write, and the full-res reflect-pad copies all vanish.

Border exactness: nearest upsampling makes full-res REFLECT padding
coincide with half-res EDGE padding (U[-1] = U[1] = z[0]; U[2H] =
U[2H-2] = z[H-1]) — same lemma as ops/packed.py, re-used here.

The subsequent full-res convs that do NOT follow an upsample (upconv_0_0
at H/2, dispconv_0 at H) run as standard packed convs
(ops/packed.pack_conv3x3_kernel) on the packed activations, so the only
full-res tensor in the whole tail is the final (B, H, W, 1) disparity
written by one depth_to_space.

Exactness is reassociation-only (tap sums are computed in the param
dtype before the conv); tests/test_collapsed.py pins equality with the
standard DepthDecoder path at fp32 tolerance.

Reference parity note: this is an execution-layout rewrite of the
monodepth2-lineage decoder (SURVEY C7/C13); the architecture, weights,
and outputs are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla
from scenedepthestimation_tpu.ops.packed import (
    depth_to_space,
    pack_conv3x3_kernel,
)
from scenedepthestimation_tpu.ops.upsample import upsample_concat

# Fused Pallas u00→u01 tail chain. Values: None/False = XLA chain;
# True = ops/pallas/fused_tail.py (v1, per-tap dots); "v2" =
# ops/pallas/fused_tail_v2.py (per-phase dense dots). v1 is OFF by
# measurement (b128 judged config): one VMEM pass but only half MXU
# utilization in its stage-2 (9 separate K=64 dots) — 29 ms vs the XLA
# chain's 16.7, e2e 1164 fps vs 1327 (BASELINE.md round-2 notes). v2 is
# the round-3 im2col revival: ky merged into K by row-offset lane
# concat, kx into N by kernel pre-concat, structural zeros dropped by
# per-phase window slicing (8 MXU pass-units vs v1's 27).
_USE_FUSED_TAIL: bool | str | None = None


def set_use_fused_tail(flag: bool | str | None) -> None:
    global _USE_FUSED_TAIL
    _USE_FUSED_TAIL = flag


# Round-3 pad-elimination (conv3x3_edge_v2 & friends): True = zero-pad
# convs + border-strip assembly (no materialized edge/reflect pads).
# A/B flag for bench/profile scripts; default ON by measurement
# (BASELINE.md round-3 notes).
_USE_NOPAD: bool = True


def set_use_nopad(flag: bool) -> None:
    global _USE_NOPAD
    _USE_NOPAD = flag


# Round-3 experiment: run decoder levels 4..2 collapsed too (upsample
# folded into upconv_i_1, skip via the stride-2 4x4 form, depth_to_space
# between levels) instead of materialized upsample_concat + ConvBlock.
# Same exact rewrite as level 1; A/B flag for the e2e bench.
_COLLAPSE_HI: bool = False

# Round-3 bordered-carry tail (ops/bordered.py): replace the per-op
# border-strip assemblies of the y1p→dispconv chain with carried exact
# border bands and ONE final assembly. The zero-border ceiling probe
# measured the per-op assemblies at ~15 ms/iter of the judged config;
# the tail carry recovers most of it: 1671 vs 1495 fps e2e (+11.8%).
_USE_BORDERED: bool = True

# Carry borders through the STANDARD levels 4..2 too (one width-reset
# assembly per level). Measured SLOWER than the per-op v2 strips there
# (1562 vs 1671 fps e2e): at the coarse grids the extra band convs and
# per-level reset exceed the two strip assemblies they replace. Kept as
# the recorded experiment; default OFF by measurement.
_BORDERED_FULL: bool = False

# Start the tail carry ONE conv earlier, at upconv_1_0 (u10): removes
# u10's strip assembly (+2.0 ms isolated, probe_border_cost) for one
# extra width unit through the tail bands.
_BORDERED_U10: bool = False

# Start the carry TWO convs earlier, at upconv_2_1 (u21) — the largest
# strip assembly outside the tail (+3.67 ms isolated). Levels 4..3 keep
# the per-op strips (their coarse grids are where the full chain lost);
# the carry then runs u21 → u10 → tail with final band width 10.
_BORDERED_U21: bool = False


def set_use_bordered(
    flag: bool,
    full: bool | None = None,
    u10: bool | None = None,
    u21: bool | None = None,
) -> None:
    global _USE_BORDERED, _BORDERED_FULL, _BORDERED_U10, _BORDERED_U21
    _USE_BORDERED = flag
    if full is not None:
        _BORDERED_FULL = full
    if u10 is not None:
        _BORDERED_U10 = u10
    if u21 is not None:
        _BORDERED_U21 = u21


def set_collapse_hi(flag: bool) -> None:
    global _COLLAPSE_HI
    _COLLAPSE_HI = flag


# Row-collapse matrices: M[a][z_offset_index, tap_index] = 1 iff full-res
# tap ``tap`` of output parity ``a`` reads half-res row p + (z_offset-1).
#   a=0: taps (dy=-1,0,1) read rows (p-1, p, p); a=1: rows (p, p, p+1).
_M = (
    np.array([[1, 0, 0], [0, 1, 1], [0, 0, 0]], np.float32),
    np.array([[0, 0, 0], [1, 1, 0], [0, 0, 1]], np.float32),
)


def collapse_upsample_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) kernel of ``conv3x3 ∘ upsample2x_nearest`` →
    (3, 3, C, 4*Co) kernel of the equivalent half-res conv producing the
    s2d-packed output (channel order g-major, g = 2a+b — matches
    ops/packed.space_to_depth)."""
    groups = []
    for a in (0, 1):
        ma = jnp.asarray(_M[a], k.dtype)
        for b in (0, 1):
            mb = jnp.asarray(_M[b], k.dtype)
            groups.append(jnp.einsum("it,ju,tuco->ijco", ma, mb, k))
    return jnp.concatenate(groups, axis=-1)


def conv3x3_edge(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """EDGE-padded 3x3 conv (the packed/collapsed-space image of the
    full-res reflect pad). No bias/activation — callers fuse those."""
    return lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_nopad(
    x: jnp.ndarray, kernel: jnp.ndarray, mode: str = "edge"
) -> jnp.ndarray:
    """3x3 conv with EDGE or REFLECT border semantics, computed without
    materializing the padded tensor (round-3 rewrite).

    Measured (bench/probe_pad.py, b128 bf16): a jnp.pad-EDGE costs
    +1.6..+13 ms at the collapsed-path shapes while a ZERO pad is free —
    XLA folds zero padding into the conv but must materialize any other
    mode AND then runs the conv misaligned (W+2). So: run the conv with
    native zero padding (aligned, no copy), recompute the four
    border-touching output strips from 2-row/2-col slices with true
    edge/reflect semantics (tiny convs), and assemble with two concats.
    A dynamic_update_slice assembly is NOT cheaper (each dus copies the
    whole operand, +0.85 ms at (96,288,64)), and additive ``lax.pad``
    corrections (conv3x3_edge_v3) are far worse in-program — the zero
    pads do not fuse into the adds (e2e 1394 -> 1162 fps when tried).

    Reflect strips: jnp.pad-reflect of a 2-row/2-col slice prepends
    exactly the reflect source row/col (pad([r0, r1]) = [r1, r0, r1]).

    Shapes with H or W < 4 (deep decoder levels at small test sizes)
    fall back to the materialized pad: the strip assembly needs
    non-degenerate interior slices, and the pad copy is free at those
    sizes anyway.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    if x.shape[1] < 4 or x.shape[2] < 4:
        return lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode),
            kernel, (1, 1), "VALID", dimension_numbers=dn,
        )
    y = lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )

    def strip(sl, pad):
        return lax.conv_general_dilated(
            jnp.pad(sl, ((0, 0), *pad, (0, 0)), mode=mode),
            kernel, (1, 1), "VALID", dimension_numbers=dn,
        )

    top = strip(x[:, :2], (((1, 0), (1, 1))))  # (B, 1, W, Co)
    bot = strip(x[:, -2:], (((0, 1), (1, 1))))
    left = strip(x[:, :, :2], (((1, 1), (1, 0))))  # (B, H, 1, Co)
    right = strip(x[:, :, -2:], (((1, 1), (0, 1))))
    mid = jnp.concatenate(
        [top[:, :, 1:-1], y[:, 1:-1, 1:-1], bot[:, :, 1:-1]], axis=1
    )
    return jnp.concatenate([left, mid, right], axis=2)


def conv3x3_edge_v2(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Edge-mode alias of :func:`conv3x3_nopad` (round-3 form)."""
    return conv3x3_nopad(x, kernel, mode="edge")


def conv3x3_edge_v3(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact :func:`conv3x3_edge` as zero-pad conv + ADDITIVE border
    corrections (round-3 final form).

    v2's strip-recompute + concat assembly measured +5.3 ms at the
    dispconv shape (bench/probe_tail.py) — the thin strip convs and
    full-tensor concats don't fuse. Here the border terms are added
    instead: O_edge = O_zero + Σ pad(C_side), where each C_side is a
    1-row/1-col correction conv (the taps that zero padding dropped,
    with edge semantics) and the zero ``lax.pad``s fuse lazily into the
    consuming add — no extra full-tensor passes at all.

    Corner exactness: the row corrections are computed with W-edge pads
    (so they carry the diagonal corner taps); the column corrections use
    zero row-padding, so corner terms are counted exactly once.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    h, w = x.shape[1], x.shape[2]
    y = lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )

    def row_corr(row, krow):  # (B,1,W,C) x (1,3,C,Co) with W-edge pad
        return lax.conv_general_dilated(
            jnp.pad(row, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge"),
            krow, (1, 1), "VALID", dimension_numbers=dn,
        )

    def col_corr(col, kcol):  # (B,H,1,C) x (3,1,C,Co) with H-zero pad
        return lax.conv_general_dilated(
            col, kcol, (1, 1), ((1, 1), (0, 0)), dimension_numbers=dn
        )

    ct = row_corr(x[:, :1], kernel[0:1])
    cb = row_corr(x[:, -1:], kernel[2:3])
    cl = col_corr(x[:, :, :1], kernel[:, 0:1])
    cr = col_corr(x[:, :, -1:], kernel[:, 2:3])
    zero = jnp.zeros((), y.dtype)
    y = y + lax.pad(ct.astype(y.dtype), zero, [(0, 0, 0), (0, h - 1, 0), (0, 0, 0), (0, 0, 0)])
    y = y + lax.pad(cb.astype(y.dtype), zero, [(0, 0, 0), (h - 1, 0, 0), (0, 0, 0), (0, 0, 0)])
    y = y + lax.pad(cl.astype(y.dtype), zero, [(0, 0, 0), (0, 0, 0), (0, w - 1, 0), (0, 0, 0)])
    y = y + lax.pad(cr.astype(y.dtype), zero, [(0, 0, 0), (0, 0, 0), (w - 1, 0, 0), (0, 0, 0)])
    return y


def strided_skip_conv_v3(x: jnp.ndarray, kernel4: jnp.ndarray) -> jnp.ndarray:
    """Exact :func:`strided_skip_conv` (reflect (1,2)/(1,2), 4x4, s2) as
    zero-pad conv + additive reflect-border corrections (see
    conv3x3_edge_v3). Reflect sources: row -1 ≡ x[1], row H ≡ x[H-2]
    (row H+1 / col W+1 are never read — the last window starts at H-2 of
    the padded frame); same for columns.
    """
    dn = ("NHWC", "HWIO", "NHWC")
    h, w = x.shape[1], x.shape[2]
    p_out, q_out = h // 2, w // 2
    y = lax.conv_general_dilated(
        x, kernel4, (2, 2), ((1, 2), (1, 2)), dimension_numbers=dn
    )

    def row_corr(row, krow):  # (B,1,W,C) x (1,4,C,Co), stride-2 cols,
        # reflect W pads (col -1 ≡ x[...,1], col W ≡ x[...,W-2])
        return lax.conv_general_dilated(
            jnp.pad(row, ((0, 0), (0, 0), (1, 2), (0, 0)), mode="reflect"),
            krow, (1, 2), "VALID", dimension_numbers=dn,
        )

    def col_corr(col, kcol):  # (B,H,1,C) x (4,1,C,Co), stride-2 rows,
        # zero row pads (out-of-range rows belong to the row corrections)
        return lax.conv_general_dilated(
            col, kcol, (2, 1), ((1, 2), (0, 0)), dimension_numbers=dn
        )

    ct = row_corr(x[:, 1:2], kernel4[0:1])  # row -1 ≡ x[1]
    cb = row_corr(x[:, h - 2 : h - 1], kernel4[3:4])  # row H ≡ x[H-2]
    cl = col_corr(x[:, :, 1:2], kernel4[:, 0:1])  # col -1 ≡ x[:,1]
    cr = col_corr(x[:, :, w - 2 : w - 1], kernel4[:, 3:4])  # col W ≡ x[:,W-2]
    zero = jnp.zeros((), y.dtype)
    y = y + lax.pad(ct.astype(y.dtype), zero, [(0, 0, 0), (0, p_out - 1, 0), (0, 0, 0), (0, 0, 0)])
    y = y + lax.pad(cb.astype(y.dtype), zero, [(0, 0, 0), (p_out - 1, 0, 0), (0, 0, 0), (0, 0, 0)])
    y = y + lax.pad(cl.astype(y.dtype), zero, [(0, 0, 0), (0, 0, 0), (0, q_out - 1, 0), (0, 0, 0)])
    y = y + lax.pad(cr.astype(y.dtype), zero, [(0, 0, 0), (0, 0, 0), (q_out - 1, 0, 0), (0, 0, 0)])
    return y


def strided_skip_conv_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) kernel of a reflect-padded 3x3 conv whose output is
    wanted s2d-PACKED → the (4, 4, C, 4*Co) stride-2 kernel that computes
    it DIRECTLY from the unpacked input (use with
    :func:`strided_skip_conv`).

    Versus packing the input (s2d + a (3,3,4C,4Co) conv = 4x FLOPs and a
    full extra pass over the tensor), the strided form reads the source
    once and carries only 16/9 the original taps: output parity (a, b)
    at strided position (p, q) reads input rows 2p+a+dy — i.e. rows
    2p-1..2p+2 — so a 4x4 stride-2 window covers all four parities, with
    tap (u, v) of output group (a, b) equal to k[u-a, v-b] (zero when the
    index leaves [0, 2]).

    This is the right form for the non-upsampled operand of a conv whose
    output wants packing (the skip branch of decoder level 1); the
    upsampled operand uses :func:`collapse_upsample_conv_kernel`.
    """
    c, co = k.shape[2], k.shape[3]
    zero = jnp.zeros((c, co), k.dtype)
    rows = []
    for u in range(4):
        cols = []
        for v in range(4):
            go = []
            for a in (0, 1):
                for b in (0, 1):
                    go.append(
                        k[u - a, v - b]
                        if 0 <= u - a <= 2 and 0 <= v - b <= 2
                        else zero
                    )
            cols.append(jnp.concatenate(go, axis=1))  # (C, 4*Co)
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # (4, 4, C, 4*Co)


def pad_packed_edge(x: jnp.ndarray) -> jnp.ndarray:
    """Pad an s2d-PACKED tensor so a VALID 3x3 conv reproduces an EDGE
    border of the UNPACKED plane.

    The reflect↔edge lemma of ops/packed.py does not transfer to edge:
    the top halo row of a packed conv is only read at its α=1 channel
    slot, which must hold unpacked row -1 ≡ edge ≡ unpacked row 0 = the
    α=0 group of packed row 0 — so the halo is packed row 0 with its
    α=0 half duplicated into BOTH α slots (bottom: the α=1 half;
    left/right columns: the β=0 / β=1 groups; corners compose).

    Needed when packing a conv whose own border is already EDGE — e.g.
    the dispconv over the double-packed y0pp (the fused-tail output),
    whose half-res border is the edge image of the full-res reflect.
    """
    c4 = x.shape[-1]
    half, q = c4 // 2, c4 // 4
    top = jnp.concatenate([x[:, :1, :, :half], x[:, :1, :, :half]], axis=-1)
    bot = jnp.concatenate([x[:, -1:, :, half:], x[:, -1:, :, half:]], axis=-1)
    x = jnp.concatenate([top, x, bot], axis=1)
    lcol = x[:, :, :1]
    left = jnp.concatenate(
        [lcol[..., 0:q], lcol[..., 0:q], lcol[..., 2 * q : 3 * q],
         lcol[..., 2 * q : 3 * q]],
        axis=-1,
    )
    rcol = x[:, :, -1:]
    right = jnp.concatenate(
        [rcol[..., q : 2 * q], rcol[..., q : 2 * q],
         rcol[..., 3 * q : 4 * q], rcol[..., 3 * q : 4 * q]],
        axis=-1,
    )
    return jnp.concatenate([left, x, right], axis=2)


def colpack_conv_kernel(kp: jnp.ndarray, block: int = 32) -> jnp.ndarray:
    """(3, 3, C, G) conv kernel → (3, block+2, C, block*G) kernel whose
    output packs ``block`` consecutive output COLUMNS into channels.

    Why: a conv with tiny Cout (the disparity head: G=4 packed, G=1 at
    full res) starves the MXU's output dimension — measured 13-15 ms at
    the judged config for 65 GFLOP of useful work. Packing 32 columns
    into N gives a (3, 34, C, 128) kernel at stride (1, 32): 34/3 ≈ 11x
    structural-zero FLOPs but ~30x utilization — measured win in
    BASELINE.md. Output channel order is column-major: (b*G + g) holds
    column ``32Q+b``, channel g; a plain reshape unpacks it.
    """
    three, _, c, g = kp.shape
    zeros = jnp.zeros((3, c, g), kp.dtype)
    cols = []
    for v in range(block + 2):
        outs = [
            kp[:, v - b_] if 0 <= v - b_ <= 2 else zeros
            for b_ in range(block)
        ]
        cols.append(jnp.concatenate(outs, axis=-1))  # (3, C, block*G)
    return jnp.stack(cols, axis=1)  # (3, block+2, C, block*G)


def colpack_conv_edge(
    x: jnp.ndarray, kernel: jnp.ndarray, g: int, block: int = 32
) -> jnp.ndarray:
    """EDGE-padded 3x3 conv with tiny Cout=g, computed column-packed.

    x (B, H, W, C) with W % block == 0 → (B, H, W, g), equal to
    ``conv3x3_edge(x, kp)`` with ``kernel = colpack_conv_kernel(kp)``.
    """
    b, h, w, _ = x.shape
    y = lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
        kernel,
        window_strides=(1, block),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W/block, block*g)
    return y.reshape(b, h, w, g)


def strided_skip_conv(x: jnp.ndarray, kernel4: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H/2, W/2, 4*Co): reflect-padded 3x3 conv with
    s2d-packed output, computed directly by a stride-2 4x4 conv.

    The reflect pad is the conv's OWN (its input sits at the conv's
    resolution — unlike the packed/collapsed operands whose border is
    the image of a full-res reflect, i.e. edge)."""
    return lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="reflect"),
        kernel4,
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def strided_skip_conv_v2(x: jnp.ndarray, kernel4: jnp.ndarray) -> jnp.ndarray:
    """Exact :func:`strided_skip_conv` without the materialized reflect
    pad (same zero-pad + border-strip assembly as conv3x3_edge_v2; see
    that docstring for the measurements).

    Geometry: pad ((1,2),(1,2)) reflect, 4x4 window, stride 2 — the
    second hi-pad row/col is never read (last window starts at H-2 of
    the padded frame), so the strips only need one reflect row/col.

    H or W < 8 falls back to the materialized pad (degenerate strips).
    """
    if x.shape[1] < 8 or x.shape[2] < 8:
        return strided_skip_conv(x, kernel4)
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(
        x, kernel4, (2, 2), ((1, 2), (1, 2)), dimension_numbers=dn
    )

    def strip(sl, pad):
        return lax.conv_general_dilated(
            jnp.pad(sl, ((0, 0), *pad, (0, 0)), mode="reflect"),
            kernel4, (2, 2), "VALID", dimension_numbers=dn,
        )

    top = strip(x[:, :3], ((1, 0), (1, 1)))  # (B, 1, W/2, 4Co)
    bot = strip(x[:, -3:], ((0, 1), (1, 1)))
    left = strip(x[:, :, :3], ((1, 1), (1, 0)))  # (B, H/2, 1, 4Co)
    right = strip(x[:, :, -3:], ((1, 1), (0, 1)))
    mid = jnp.concatenate(
        [top[:, :, 1:-1], y[:, 1:-1, 1:-1], bot[:, :, 1:-1]], axis=1
    )
    return jnp.concatenate([left, mid, right], axis=2)


def colpack_conv_edge_v2(
    x: jnp.ndarray, kp: jnp.ndarray, block: int = 32
) -> jnp.ndarray:
    """Exact :func:`colpack_conv_edge` (edge-padded packed-Cout conv via
    column packing) without the materialized edge pad.

    The probe (bench/probe_pad.py) measured the edge pad at THIS shape
    ((192,576,64->4), b128) at +13 ms vs native zero padding — the
    single largest movement cost in the round-2 tail. The packed conv
    runs with native zero padding (aligned, stride (1, block)); the four
    border strips are recomputed with the UNPACKED kernel ``kp``
    (Cout=g tiny convs over 2-row/2-col slices) and assembled with two
    concats on the small (B, H, W, g) output.

    H < 4 falls back to the materialized-pad colpack (degenerate strips;
    W is always >= 32 here — the caller gates on W % 32 == 0).
    """
    b, h, w, _ = x.shape
    g = kp.shape[-1]
    if h < 4:
        return colpack_conv_edge(x, colpack_conv_kernel(kp, block), g)
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(
        x, colpack_conv_kernel(kp, block), (1, block), ((1, 1), (1, 1)),
        dimension_numbers=dn,
    ).reshape(b, h, w, g)

    def strip(sl, pad):
        return lax.conv_general_dilated(
            jnp.pad(sl, ((0, 0), *pad, (0, 0)), mode="edge"),
            kp, (1, 1), "VALID", dimension_numbers=dn,
        )

    top = strip(x[:, :2], ((1, 0), (1, 1)))
    bot = strip(x[:, -2:], ((0, 1), (1, 1)))
    left = strip(x[:, :, :2], ((1, 1), (1, 0)))
    right = strip(x[:, :, -2:], ((1, 1), (0, 1)))
    mid = jnp.concatenate(
        [top[:, :, 1:-1], y[:, 1:-1, 1:-1], bot[:, :, 1:-1]], axis=1
    )
    return jnp.concatenate([left, mid, right], axis=2)


def collapsed_cost_aggregation(
    params, x: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """Inference-layout rewrite of models/stereo.CostAggregation: the
    three decoder levels run collapsed (upsample folded into the conv,
    skip via the stride-2 4x4 form) and the cost head packed.

    ZERO borders throughout (ConvRelu pads with zeros, unlike the mono
    decoder's reflect) — which makes every border exact under plain
    zero padding in the packed/collapsed forms, so all pads fold into
    the conv ops and no pad copy is ever materialized.

    ``params`` is the CostAggregation param tree; aux_heads (refine
    training mode) are not supported — callers keep the module path
    there. Returns the (B, H4, W4, D) cost logits, equal to
    ``CostAggregation(...)(x)`` up to reassociation error
    (tests/test_collapsed.py pins it).
    """

    def p(name):
        # ConvRelu nests its nn.Conv under "conv"; cost_head is a bare
        # nn.Conv.
        q = params[name].get("conv", params[name])
        return q["kernel"].astype(dtype), q["bias"].astype(dtype)

    def cr(t, name, stride=1):  # ConvRelu: zero-pad conv3x3 + relu
        k, b = p(name)
        y = lax.conv_general_dilated(
            t, k, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + b)

    x = x.astype(dtype)
    e0 = cr(x, "enc0")
    e1 = cr(cr(e0, "enc1", 2), "enc1b")
    e2 = cr(cr(e1, "enc2", 2), "enc2b")
    e3 = cr(cr(e2, "enc3", 2), "enc3b")

    def dec(t, skip, name):
        k, b = p(name)
        ct = t.shape[-1]
        y = lax.conv_general_dilated(
            t,
            collapse_upsample_conv_kernel(k[:, :, :ct, :]),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + lax.conv_general_dilated(
            skip,
            strided_skip_conv_kernel(k[:, :, ct:, :]),
            (2, 2),
            ((1, 2), (1, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jax.nn.relu(y + jnp.tile(b, 4))  # packed output

    d2 = depth_to_space(dec(e3, e2, "dec2"))
    d1 = depth_to_space(dec(d2, e1, "dec1"))
    d0p = dec(d1, e0, "dec0")  # packed (B, H4/2, W4/2, 4*c0)

    kh, bh = p("cost_head")
    cost_p = lax.conv_general_dilated(
        d0p,
        pack_conv3x3_kernel(kh),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.tile(bh, 4)
    return depth_to_space(cost_p)  # (B, H4, W4, D)


def refinement_forward(
    params, f_l: jnp.ndarray, disp_q: jnp.ndarray, max_disp: float,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Functional inference form of models/stereo.Refinement (three small
    zero-pad convs), so refine-trained checkpoints can ride the packed
    aggregation path instead of falling back to the module path
    (VERDICT r2 next-#2). Exact same math as the module; the aux-scale
    cost heads are training-only and never evaluated here.

    Two layout rewrites (round 3, both exact by linearity):
    * conv1 splits the (feats ++ disp) concat — the C=65 operand breaks
      64-channel tile alignment; conv over the aligned 64ch features
      plus a tiny 1-channel conv for the disparity plane sums to the
      same output.
    * the Cout=1 residual head runs column-packed (colpack_conv_kernel)
      when W % 32 == 0 — same N-starvation fix as the mono dispconv,
      with plain zero padding (the module's own border semantics).
    """
    dn = ("NHWC", "HWIO", "NHWC")
    d = (disp_q / max_disp).astype(dtype)[..., None]
    cf = f_l.shape[-1]
    q1 = params["conv1"]["conv"]
    k1 = q1["kernel"].astype(dtype)
    y = lax.conv_general_dilated(
        f_l.astype(dtype), k1[:, :, :cf, :], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn,
    )
    y = y + lax.conv_general_dilated(
        d, k1[:, :, cf:, :], (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
    )
    x = jax.nn.relu(y + q1["bias"].astype(dtype))
    q2 = params["conv2"]["conv"]
    x = jax.nn.relu(
        lax.conv_general_dilated(
            x, q2["kernel"].astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn,
        )
        + q2["bias"].astype(dtype)
    )
    q = params["residual"]
    kr = q["kernel"].astype(dtype)
    b_, h, w, _ = x.shape
    # Colpack pays an 11x structural-zero FLOP tax for ~30x N-fill; it
    # wins only when M is large enough to amortize (measured: b16 804 vs
    # 784 fps with it, b2 652 vs 677 WITHOUT it — BASELINE.md round 3).
    if w % 32 == 0 and b_ * h * w >= 1 << 18:
        r = lax.conv_general_dilated(
            x,
            colpack_conv_kernel(kr),
            window_strides=(1, 32),
            padding=((1, 1), (1, 1)),
            dimension_numbers=dn,
        ).reshape(b_, h, w, 1)
    else:
        r = lax.conv_general_dilated(
            x, kr, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn
        )
    r = r + q["bias"].astype(dtype)
    return disp_q + r[..., 0].astype(jnp.float32) * max_disp


def _conv3x3_zero(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Plain ZERO-padded 3x3 conv — the fast-border serving form: the
    zero pad folds into the conv (no copy, no strips). Numerically wrong
    at the reflect/edge borders; see ``border_mode='fast'``."""
    return lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _strided_skip_conv_zero(x: jnp.ndarray, kernel4: jnp.ndarray) -> jnp.ndarray:
    """Zero-border form of :func:`strided_skip_conv` (fast mode)."""
    return lax.conv_general_dilated(
        x, kernel4, (2, 2), ((1, 2), (1, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def collapsed_mono_decoder(
    dec_params,
    features,
    dec_channels=(16, 32, 64, 128, 256),
    upsample_mode: str = "nearest",
    dtype=jnp.float32,
    disp_variant: str = "packed",
    disp_to_depth_minmax=None,
    border_mode: str = "exact",
) -> jnp.ndarray:
    """Scale-0 disparity with levels 1 and 0 in collapsed/packed layout.

    Reads the standard ``DepthDecoder`` param tree (checkpoints and the
    torch importer are unaffected). Returns (B, H, W, 1) fp32 sigmoid
    disparity, equal to ``DepthDecoder(...)(features)[0]`` up to
    reassociation error.

    disp_variant:
      * "packed" — dispconv as a packed (3, 3, 4c0, 4) conv at H/2.
      * "fullres" — depth_to_space the packed u01 output and run the
        dispconv at full res (XLA baseline for the variant bench).

    ``disp_to_depth_minmax=(min_depth, max_depth)`` fuses the
    disp→depth epilogue INTO the packed layout (round 3): sigmoid /
    scaled-disp / reciprocal run on the (B, H/2, W/2*4) merged-minor
    view (full 128-lane tiles instead of a 4-wide trailing dim) and the
    two maps each leave through one depth_to_space. Returns
    {'disp': (B,H,W) scaled_disp, 'depth': (B,H,W)} fp32 instead of the
    sigmoid tensor. Only exact when the caller needs no source-res
    resize between sigmoid and conversion (resize and disp_to_depth do
    not commute).
    """
    assert upsample_mode == "nearest", "collapse requires nearest upsample"
    assert border_mode in ("exact", "fast")
    # border_mode='fast' (opt-in, MonoConfig.fast_borders): every conv
    # runs with plain ZERO padding — no strips, no bordered carry, no
    # assemblies. The round-3 ceiling probe productized: deviates from
    # the reference's reflect-border semantics in a band near the image
    # borders (interior bit-identical; measured abs-rel impact in
    # BASELINE.md) and buys the ~8% the border machinery costs.
    fast = border_mode == "fast"
    c0, c1 = dec_channels[0], dec_channels[1]
    # v2 (strip-concat assembly) is the measured round-3 winner; the v3
    # additive-correction form regressed e2e (see conv3x3_nopad notes).
    if fast:
        edge_conv = _conv3x3_zero
        skip_conv = _strided_skip_conv_zero
    else:
        edge_conv = conv3x3_edge_v2 if _USE_NOPAD else conv3x3_edge
        skip_conv = strided_skip_conv_v2 if _USE_NOPAD else strided_skip_conv

    def p(name):
        q = dec_params[name]["conv"]
        return q["kernel"], q["bias"]

    def cb(name, t):  # standard ConvBlock: reflect-border conv3x3 + ELU
        k, b = p(name)
        if fast:
            y = _conv3x3_zero(t.astype(dtype), k.astype(dtype))
            return jax.nn.elu(y + b.astype(dtype))
        if _USE_NOPAD:
            # Zero-pad conv + reflect border strips — same rewrite as the
            # collapsed levels, applied to the standard-level ConvBlocks
            # whose jnp.pad-reflect otherwise materializes multi-GB
            # tensors at b128 (upconv_2_1 input alone is 3.6 GB).
            y = conv3x3_nopad(t.astype(dtype), k.astype(dtype), mode="reflect")
            return jax.nn.elu(y + b.astype(dtype))
        return conv3x3_xla(t.astype(dtype), k.astype(dtype), b.astype(dtype), "elu")

    use_bordered = (
        _USE_BORDERED
        and not fast
        and _USE_NOPAD
        and disp_variant == "packed"
        and not _USE_FUSED_TAIL
        and not _COLLAPSE_HI
    )
    full_bordered = (
        use_bordered
        and _BORDERED_FULL
        and features[-1].shape[1] >= 8
        and features[-1].shape[2] >= 8
    )
    if full_bordered:
        # Full bordered-carry chain (ops/bordered.py): every level runs
        # plain zero-pad convs plus thin exact bands, with ONE width
        # reset (a small assembly) per level so bands stay thin — the
        # carried width would otherwise double at every upsample.
        from scenedepthestimation_tpu.ops import bordered as B

        def bcb(name, btv):
            k, b_ = p(name)
            btv = B.bordered_conv3x3(btv, k.astype(dtype), mode="reflect")
            bb_ = b_.astype(dtype)
            return B.bordered_map(lambda v: jax.nn.elu(v + bb_), btv)

        bt = B.bordered_from_exact(features[-1].astype(dtype))
        for i in (4, 3, 2):
            bt = bcb(f"upconv_{i}_0", bt)
            bt = B.bordered_upsample_concat(
                bt, features[i - 1].astype(dtype), mode=upsample_mode
            )
            bt = bcb(f"upconv_{i}_1", bt)
            bt = B.bordered_from_exact(B.bordered_assemble(bt))
        t = bcb("upconv_1_0", bt)  # Bordered, w = 1
        k11, b11 = p("upconv_1_1")
        dp = _bordered_tail(
            p, t, features[0].astype(dtype), k11.astype(dtype), b11, c1, dtype
        )
        return _packed_head_epilogue(dp, disp_to_depth_minmax)

    x = features[-1]
    u21_carry = (
        use_bordered
        and _BORDERED_U21
        and features[1].shape[1] >= 32
        and features[1].shape[2] >= 32
    )
    levels = (4, 3) if u21_carry else (4, 3, 2)
    for i in levels:
        x = cb(f"upconv_{i}_0", x)
        if _COLLAPSE_HI:
            # Same collapse as level 1: fold the nearest upsample into
            # upconv_i_1 (t-part via the derived (3,3,C,4Co) kernel,
            # skip read directly through the stride-2 4x4 form), then
            # depth_to_space for the next level's standard conv. The
            # upsampled operand's full-grid reflect border is EDGE on
            # the half grid; the skip's reflect is its own-res reflect.
            ki, bi = p(f"upconv_{i}_1")
            ki = ki.astype(dtype)
            ct = x.shape[-1]
            y = edge_conv(x, collapse_upsample_conv_kernel(ki[:, :, :ct, :]))
            y = y + skip_conv(
                features[i - 1].astype(dtype),
                strided_skip_conv_kernel(ki[:, :, ct:, :]),
            )
            x = depth_to_space(jax.nn.elu(y + jnp.tile(bi.astype(dtype), 4)))
        else:
            x = upsample_concat(x, features[i - 1], mode=upsample_mode)
            x = cb(f"upconv_{i}_1", x)

    # ---- level 1: upconv_1_1 over concat([upsample(t), features[0]]) --
    # The t-part collapses (it is the upsampled operand); the skip part
    # reads features[0] directly through the stride-2 4x4 form (no s2d
    # pass, 16/9 taps instead of the packed conv's 4x). Both emit the
    # same packed output layout, so they sum before the shared bias+ELU.
    if u21_carry:
        # Carry from u21: level 2's conv runs bordered (w 0→1), u10 rides
        # the same carry (w→2), the tail takes it from there (final w 10).
        from scenedepthestimation_tpu.ops import bordered as B

        x = cb("upconv_2_0", x)
        x = upsample_concat(x, features[1], mode=upsample_mode)
        k21, b21 = p("upconv_2_1")
        bt21 = B.bordered_conv3x3(
            B.bordered_from_exact(x.astype(dtype)),
            k21.astype(dtype),
            mode="reflect",
        )
        b21c = b21.astype(dtype)
        bt21 = B.bordered_map(lambda v: jax.nn.elu(v + b21c), bt21)
        k10, b10 = p("upconv_1_0")
        tb10 = B.bordered_conv3x3(bt21, k10.astype(dtype), mode="reflect")
        b10c = b10.astype(dtype)
        t = B.bordered_map(lambda v: jax.nn.elu(v + b10c), tb10)
    elif (
        use_bordered
        and _BORDERED_U10
        and x.shape[1] >= 16
        and x.shape[2] >= 16
    ):
        # Start the carry at u10: one more width unit through the tail
        # bands buys away u10's strip assembly.
        from scenedepthestimation_tpu.ops import bordered as B

        k10, b10 = p("upconv_1_0")
        tb = B.bordered_conv3x3(
            B.bordered_from_exact(x.astype(dtype)),
            k10.astype(dtype),
            mode="reflect",
        )
        b10c = b10.astype(dtype)
        t = B.bordered_map(lambda v: jax.nn.elu(v + b10c), tb)
    else:
        t = cb("upconv_1_0", x)  # (B, H/4, W/4, c1)
    k11, b11 = p("upconv_1_1")
    k11 = k11.astype(dtype)
    tm = t.mid if not isinstance(t, jnp.ndarray) else t
    if use_bordered and tm.shape[1] >= 16 and tm.shape[2] >= 16:
        # Tail-only carry (inputs too small for the full chain's coarse
        # -level bands): levels 4..2 ran the per-op v2 path above.
        dp = _bordered_tail(
            p, t, features[0].astype(dtype), k11, b11, c1, dtype
        )
        return _packed_head_epilogue(dp, disp_to_depth_minmax)
    y1p = edge_conv(t, collapse_upsample_conv_kernel(k11[:, :, :c1, :]))
    y1p = y1p + skip_conv(
        features[0].astype(dtype),
        strided_skip_conv_kernel(k11[:, :, c1:, :]),
    )
    y1p = jax.nn.elu(y1p + jnp.tile(b11.astype(dtype), 4))
    # (B, H/4, W/4, 4*c1) = packed (H/2, W/2, c1)

    # ---- u00 → d2s → collapsed u01: fused Pallas chain on TPU ---------
    k00, b00 = p("upconv_0_0")
    k01, b01 = p("upconv_0_1")
    use_fused = bool(_USE_FUSED_TAIL)
    if use_fused:
        if _USE_FUSED_TAIL == "v2":
            from scenedepthestimation_tpu.ops.pallas import fused_tail_v2

            fused_mod, fused_fn = (
                fused_tail_v2, fused_tail_v2.fused_tail_pallas_v2,
            )
        else:
            from scenedepthestimation_tpu.ops.pallas import fused_tail

            fused_mod, fused_fn = fused_tail, fused_tail.fused_tail_pallas
        use_fused = 0 < fused_mod._pick_th(
            y1p.shape[1], y1p.shape[2], y1p.shape[3], 4 * c0, 16 * c0,
            jnp.dtype(dtype).itemsize,
        )
    if use_fused:
        y0pp = fused_fn(
            y1p,
            pack_conv3x3_kernel(k00.astype(dtype)),
            jnp.tile(b00.astype(dtype), 4),
            pack_conv3x3_kernel(
                collapse_upsample_conv_kernel(k01.astype(dtype))
            ),
            jnp.tile(b01.astype(dtype), 16),
        )  # (B, H/4, W/4, 16*c0) = DOUBLE-packed u01 output
        kd, bd = p("dispconv_0")
        if disp_variant == "fullres":
            assert disp_to_depth_minmax is None
            y0 = depth_to_space(depth_to_space(y0pp))  # (B, H, W, c0)
            d = conv3x3_xla(y0, kd.astype(dtype), bd.astype(dtype), "none")
            return jax.nn.sigmoid(d.astype(jnp.float32))
        # dispconv consumed double-packed: pack the (already packed-at-
        # H/2, edge-bordered) dispconv once more; the border needs the
        # grouped-edge pad, NOT plain edge (pad_packed_edge docstring).
        kd2 = pack_conv3x3_kernel(
            pack_conv3x3_kernel(kd.astype(dtype))
        )  # (3, 3, 16*c0, 16)
        dp2 = lax.conv_general_dilated(
            pad_packed_edge(y0pp),
            kd2,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        dp2 = dp2 + jnp.tile(bd.astype(dtype), 16)
        # (B, H/4, W/4, 16) double-packed disparity logits
        if disp_to_depth_minmax is None:
            dp2 = jax.nn.sigmoid(dp2.astype(jnp.float32))
            return depth_to_space(depth_to_space(dp2))  # (B, H, W, 1) fp32
        # Fused disp→depth epilogue on the merged-minor DOUBLE-packed
        # view — same trick as _packed_head_epilogue, one more unpack.
        bb, hh, ww, _ = dp2.shape
        sig = jax.nn.sigmoid(dp2.reshape(bb, hh, ww * 16).astype(jnp.float32))
        from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth

        scaled, depth = disp_to_depth(sig, *disp_to_depth_minmax)

        def unpack2(v):
            return depth_to_space(
                depth_to_space(v.reshape(bb, hh, ww, 16))
            )[..., 0]

        return {"disp": unpack2(scaled), "depth": unpack2(depth)}
    else:
        zp = jax.nn.elu(
            edge_conv(y1p, pack_conv3x3_kernel(k00.astype(dtype)))
            + jnp.tile(b00.astype(dtype), 4)
        )  # (B, H/4, W/4, 4*c0) = packed (H/2, W/2, c0)
        # Unpack z first: the collapsed conv then runs at (H/2, W/2) with
        # the ORIGINAL FLOP count; composing with the packing instead (a
        # conv at H/4) re-introduces 4x structural-zero FLOPs — the XLA
        # path eats the d2s pass instead, the Pallas path above keeps the
        # chain in VMEM where the double-packed conv's extra MXU time is
        # cheaper than the HBM round-trips it removes.
        z = depth_to_space(zp)  # (B, H/2, W/2, c0)
        y0p = jax.nn.elu(
            edge_conv(z, collapse_upsample_conv_kernel(k01.astype(dtype)))
            + jnp.tile(b01.astype(dtype), 4)
        )  # (B, H/2, W/2, 4*c0) = packed (H, W, c0)

    kd, bd = p("dispconv_0")
    if disp_variant == "fullres":
        assert disp_to_depth_minmax is None
        y0 = depth_to_space(y0p)  # (B, H, W, c0)
        d = conv3x3_xla(y0, kd.astype(dtype), bd.astype(dtype), "none")
        return jax.nn.sigmoid(d.astype(jnp.float32))
    kdp = pack_conv3x3_kernel(kd.astype(dtype))
    if y0p.shape[2] % 32 == 0:
        # Column-packed: the Cout=4 head starves the MXU's N dimension;
        # packing 32 output columns into channels runs it at full
        # utilization. With _USE_NOPAD the edge border comes from strip
        # assembly instead of a materialized pad (probe_pad.py measured
        # that pad at +13 ms).
        if fast:
            bb_, hh_, ww_, _ = y0p.shape
            dp = lax.conv_general_dilated(
                y0p, colpack_conv_kernel(kdp), (1, 32), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(bb_, hh_, ww_, 4)
        elif _USE_NOPAD:
            dp = colpack_conv_edge_v2(y0p, kdp)
        else:
            dp = colpack_conv_edge(y0p, colpack_conv_kernel(kdp), 4)
    else:
        dp = edge_conv(y0p, kdp)
    dp = dp + jnp.tile(bd.astype(dtype), 4)  # (B, H/2, W/2, 4) logits
    return _packed_head_epilogue(dp, disp_to_depth_minmax)


def collapsed_mono_decoder_multiscale(
    dec_params,
    features,
    dec_channels=(16, 32, 64, 128, 256),
    upsample_mode: str = "nearest",
    dtype=jnp.float32,
    scales=(0, 1, 2, 3),
):
    """All four sigmoid disparity scales with levels 1/0 in the
    collapsed/packed layout — the TRAIN-forward twin of
    :func:`collapsed_mono_decoder` (which emits scale 0 only).

    The collapse is an exact execution rewrite built from plain jnp/lax
    ops (convs, concats, slices), so its jax.grad equals the standard
    ``DepthDecoder`` path's gradients to reassociation error —
    tests/test_collapsed_train.py pins the forward, the gradients, and a
    full optimizer step. Engaged by ``MonoConfig.collapsed_train``.
    The inference-only micro-optimizations (bordered carry, fused Pallas
    tail, colpack head) are deliberately NOT used here: their payoff is
    inference-shaped and the per-op strip forms keep the backward
    simple.

    Scale-1 subtlety: ``dispconv_1`` runs at (H/2, W/2) with REFLECT
    borders on the unpacked level-1 output; on the packed ``y1p`` that
    is the packed conv with EDGE borders (ops/packed.py lemma), emitting
    the packed disparity — one depth_to_space recovers the plane.
    """
    assert upsample_mode == "nearest", "collapse requires nearest upsample"
    c0, c1 = dec_channels[0], dec_channels[1]
    edge_conv = conv3x3_edge_v2 if _USE_NOPAD else conv3x3_edge
    skip_conv = strided_skip_conv_v2 if _USE_NOPAD else strided_skip_conv

    def p(name):
        q = dec_params[name]["conv"]
        return q["kernel"], q["bias"]

    def cb(name, t):  # standard ConvBlock: reflect-border conv3x3 + ELU
        k, b = p(name)
        if _USE_NOPAD:
            y = conv3x3_nopad(t.astype(dtype), k.astype(dtype), mode="reflect")
            return jax.nn.elu(y + b.astype(dtype))
        return conv3x3_xla(t.astype(dtype), k.astype(dtype), b.astype(dtype), "elu")

    def head(name, t):  # reflect-border dispconv + fp32 sigmoid
        k, b = p(name)
        if _USE_NOPAD:
            y = conv3x3_nopad(t.astype(dtype), k.astype(dtype), mode="reflect")
            y = y + b.astype(dtype)
        else:
            y = conv3x3_xla(
                t.astype(dtype), k.astype(dtype), b.astype(dtype), "none"
            )
        return jax.nn.sigmoid(y.astype(jnp.float32))

    outputs = {}
    x = features[-1]
    for i in (4, 3, 2):
        x = cb(f"upconv_{i}_0", x)
        x = upsample_concat(x, features[i - 1], mode=upsample_mode)
        x = cb(f"upconv_{i}_1", x)
        if i in scales:
            outputs[i] = head(f"dispconv_{i}", x)

    t = cb("upconv_1_0", x)  # (B, H/4, W/4, c1)
    k11, b11 = p("upconv_1_1")
    k11 = k11.astype(dtype)
    y1p = edge_conv(t, collapse_upsample_conv_kernel(k11[:, :, :c1, :]))
    y1p = y1p + skip_conv(
        features[0].astype(dtype),
        strided_skip_conv_kernel(k11[:, :, c1:, :]),
    )
    y1p = jax.nn.elu(y1p + jnp.tile(b11.astype(dtype), 4))
    if 1 in scales:
        kd1, bd1 = p("dispconv_1")
        d1 = edge_conv(y1p, pack_conv3x3_kernel(kd1.astype(dtype)))
        d1 = d1 + jnp.tile(bd1.astype(dtype), 4)
        outputs[1] = depth_to_space(jax.nn.sigmoid(d1.astype(jnp.float32)))

    k00, b00 = p("upconv_0_0")
    zp = jax.nn.elu(
        edge_conv(y1p, pack_conv3x3_kernel(k00.astype(dtype)))
        + jnp.tile(b00.astype(dtype), 4)
    )
    z = depth_to_space(zp)  # (B, H/2, W/2, c0)
    k01, b01 = p("upconv_0_1")
    y0p = jax.nn.elu(
        edge_conv(z, collapse_upsample_conv_kernel(k01.astype(dtype)))
        + jnp.tile(b01.astype(dtype), 4)
    )
    kd, bd = p("dispconv_0")
    d0 = edge_conv(y0p, pack_conv3x3_kernel(kd.astype(dtype)))
    d0 = d0 + jnp.tile(bd.astype(dtype), 4)
    outputs[0] = depth_to_space(jax.nn.sigmoid(d0.astype(jnp.float32)))
    return outputs


def _packed_head_epilogue(dp: jnp.ndarray, disp_to_depth_minmax):
    """Shared tail of the packed head: (B, H/2, W/2, 4) disparity logits
    → (B, H, W, 1) sigmoid map, or the fused {disp, depth} pair."""
    if disp_to_depth_minmax is None:
        dp = jax.nn.sigmoid(dp.astype(jnp.float32))
        return depth_to_space(dp)  # (B, H, W, 1) fp32
    # Fused epilogue on the merged-minor view: a (…, 4) trailing dim
    # runs elementwise passes at 4/128 lane fill; merging W/2 and the
    # parity channels into one 2*W-wide minor axis is a free reshape
    # and restores full tiles (the round-2 parity-plane-upsample lesson,
    # applied to the postprocess).
    bb, hh, ww, _ = dp.shape
    flat = dp.reshape(bb, hh, ww * 4).astype(jnp.float32)
    sig = jax.nn.sigmoid(flat)
    from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth

    scaled, depth = disp_to_depth(sig, *disp_to_depth_minmax)
    return {
        "disp": depth_to_space(scaled.reshape(bb, hh, ww, 4))[..., 0],
        "depth": depth_to_space(depth.reshape(bb, hh, ww, 4))[..., 0],
    }


def _bordered_tail(p, t, f0, k11, b11, c1, dtype):
    """y1p → u00 → d2s → u01 → dispconv with CARRIED borders
    (ops/bordered.py): plain zero-pad interior convs at full speed plus
    thin exact border bands, assembled ONCE at the packed logits instead
    of per-op strip concats. Exact — tests/test_bordered.py pins the
    result against the per-op v2 path. Returns (B, H/2, W/2, 4) logits
    (bias applied)."""
    from scenedepthestimation_tpu.ops import bordered as B

    bt = B.bordered_y1p(
        t,
        f0,
        collapse_upsample_conv_kernel(k11[:, :, :c1, :]),
        strided_skip_conv_kernel(k11[:, :, c1:, :]),
    )
    b11t = jnp.tile(b11.astype(dtype), 4)
    bt = B.bordered_map(lambda v: jax.nn.elu(v + b11t), bt)
    k00, b00 = p("upconv_0_0")
    bt = B.bordered_conv3x3(bt, pack_conv3x3_kernel(k00.astype(dtype)), "edge")
    b00t = jnp.tile(b00.astype(dtype), 4)
    bt = B.bordered_map(lambda v: jax.nn.elu(v + b00t), bt)
    bt = B.bordered_d2s(bt)
    k01, b01 = p("upconv_0_1")
    bt = B.bordered_conv3x3(
        bt, collapse_upsample_conv_kernel(k01.astype(dtype)), "edge"
    )
    b01t = jnp.tile(b01.astype(dtype), 4)
    bt = B.bordered_map(lambda v: jax.nn.elu(v + b01t), bt)
    kd, bd = p("dispconv_0")
    kdp = pack_conv3x3_kernel(kd.astype(dtype))
    mid_conv = None
    if bt.mid.shape[2] % 32 == 0:
        kcp = colpack_conv_kernel(kdp)

        def mid_conv(xm):
            bb, hh, ww, _ = xm.shape
            return lax.conv_general_dilated(
                xm, kcp, (1, 32), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(bb, hh, ww, 4)

    bt = B.bordered_conv3x3(bt, kdp, "edge", mid_conv=mid_conv)
    bdt = jnp.tile(bd.astype(dtype), 4)
    bt = B.bordered_map(lambda v: v + bdt, bt)
    return B.bordered_assemble(bt)
