"""Pallas TPU kernel: fused Winograd F(2x2, 3x3) convolution.

STATUS (round 3, measured): CORRECT but DECLINED — kept in-tree as the
recorded experiment that closes the "beat the direct-conv encoder
floor" question. On-chip at the four ResNet-18 encoder shapes (b128
bf16, perturbed-operand harness, bench/probe_winograd.py):

    layer1 (96x288 C=64):  direct 4.39 ms | wino 9.97 (0.44x)
    layer2 (48x144 C=128): direct 4.30 ms | wino 4.60 (0.93x)
    layer3 (24x72  C=256): direct 5.03 ms | wino 4.66 (1.08x)
    layer4 (12x36  C=512): direct 4.44 ms | wino 4.56 (0.97x)

and the time is FLAT in the tile size (th 2..12 all ~4.4-4.7 ms at
layer2/3, bench note in BASELINE.md), i.e. per-ELEMENT VPU work
dominates: the 2-D F(2x2,3x3) transform chain costs ~56 VPU
element-passes per element (8 H-streams + ~24 V-builds with sublane
shifts + 24 fp32 output combos) to save ~20 MXU ops/element (36 -> 16
MACs), and the v5e MXU:VPU throughput ratio prices that trade at
roughly break-even BEFORE the 16-dot scheduling overhead. At C=64 the
K=N=64 dots additionally fill a quarter of the MXU and the kernel loses
outright. bf16 MXU accumulation (to halve the output-transform traffic)
fails Mosaic verification on this toolchain. The in-program direct
convs the kernel would have to displace run ~2x faster than the
isolated-harness baseline above (XLA overlaps them with neighbors), so
production integration would need the kernel ~4x faster than measured —
structurally out of reach. The encoder-floor accounting in BASELINE.md
round 3 therefore stands against the strongest known contender.

Original motivation: the ResNet encoder's stride-1 3x3 convs are the judged mono
program's largest stage (~32 ms of ~76 at b128) and run as DIRECT convs
at ~65% of the v5e bf16 MXU peak — the XLA-level floor recorded in
BASELINE.md round 3 ("the encoder IS the floor"). Winograd F(2x2,3x3)
computes the same conv with 2.25x fewer MXU multiplies (16 products per
2x2 output tile instead of 36). An XLA-level Winograd always LOSES on
TPU because the transformed operand is 4x the input and must round-trip
HBM (measured reasoning in BASELINE.md round-2 packed-decoder analysis —
bytes, not FLOPs, bound these maps). The only winning form is a FUSED
kernel: input transform in VMEM -> 16 MXU dots -> output transform +
epilogue in VMEM, so HBM traffic stays exactly one read of x and one
write of y, while MXU work drops 2.25x.

Layout contract (phase space): Mosaic cannot lower stride-2 slicing of
VMEM values (``x[0::2]`` -> "Only 2D gather is supported",
bench/probe_winograd_feas.py), so the kernel consumes the image
pre-split into its four even/odd PHASE ARRAYS

    p_ab = x[:, a::2, b::2, :]        (B, H/2, W/2, C), a,b in {0,1}

produced by one cheap XLA pass (:func:`space_to_phases`); outputs are
written the same way (:func:`phases_to_space` interleaves back). Four
separate arrays — not a packed 4C channel stack — keep every lane
access whole-register for any C (a 4C stack would need C-offset lane
slices, a Mosaic relayout at C=64). A chain of stride-1 convs (a ResNet
stage) stays in phase space end to end, so the split/interleave passes
amortize over the whole stage.

Math. With zero padding 1, the output tile at even coordinates
(2r, 2c) is a function of the 4x4 input window starting at
(2r-1, 2c-1). Index k in [0,4) along each axis maps to input row
2r+k-1: i.e. (row-parity (k+1)%2, packed-row offset k//2) — taps touch
packed rows r-1 (parity 1), r, and r+1 (parity 0), hence the one-row
halo views. Per axis the Winograd input transform is B^T with rows
{d0-d2, d1+d2, d2-d1, d1-d3}; the output transform A^T has rows
{m0+m1+m2, m1-m2-m3}; the weight transform G has rows
{g0, (g0+g1+g2)/2, (g0-g1+g2)/2, g2} — all coefficients exactly
representable, so Winograd is exact in real arithmetic; in bf16 it adds
only rounding noise (pinned by tests/test_winograd.py).

Reference: SURVEY §2 C6 (encoder), BASELINE.md round-3 encoder-floor
accounting (the claim this kernel exists to beat).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Winograd F(2x2, 3x3) transform matrices (exact rationals).
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]]
)


def transform_weights(g: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, Co) conv kernel -> (16, C, Co) Winograd-domain weights.

    U[4i+j] = sum_{a,b} G[i,a] G[j,b] g[a,b]. Runs once at load time
    (XLA); kept fp32 until the caller casts for the MXU.
    """
    gm = jnp.asarray(_G, jnp.float32)
    u = jnp.einsum(
        "ia,jb,abco->ijco", gm, gm, g.astype(jnp.float32), optimize=True
    )
    return u.reshape((16,) + u.shape[2:])


def space_to_phases(x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """(B, H, W, C) -> 4 phase arrays (B, H/2, W/2, C): p00 p01 p10 p11."""
    return (
        x[:, 0::2, 0::2, :],
        x[:, 0::2, 1::2, :],
        x[:, 1::2, 0::2, :],
        x[:, 1::2, 1::2, :],
    )


def phases_to_space(phases: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of :func:`space_to_phases` (one interleave pass)."""
    p00, p01, p10, p11 = phases
    b, hp, wp, c = p00.shape
    rows0 = jnp.stack([p00, p01], axis=3).reshape(b, hp, 2 * wp, c)
    rows1 = jnp.stack([p10, p11], axis=3).reshape(b, hp, 2 * wp, c)
    return jnp.stack([rows0, rows1], axis=2).reshape(b, 2 * hp, 2 * wp, c)


def _wino_kernel(
    # blocks: (1, th, Wp, C) each
    p00_ref,
    p01_ref,
    p10_ref,
    p11_ref,
    # halo rows: (1, 1, Wp, C) each — next row for parity-0, prev for 1
    n00_ref,
    n01_ref,
    m10_ref,
    m11_ref,
    u_ref,  # (16, C, Co)
    bias_ref,  # (1, Co)
    *rest_refs,
    th: int,
    n_h: int,
    relu: bool,
    has_residual: bool,
    acc_dtype=jnp.float32,
):
    if has_residual:
        r_refs = rest_refs[:4]
        out_refs = rest_refs[4:]
    else:
        r_refs = ()
        out_refs = rest_refs
    o00_ref, o01_ref, o10_ref, o11_ref = out_refs

    i = pl.program_id(1)
    zero_row = jnp.zeros_like(n00_ref[0, 0])
    # Halo semantics: prev row (original row 2R-1) is the zero pad at the
    # top image edge; next row (original row 2(R+th)) is the bottom pad.
    first = i == 0
    last = i == n_h - 1
    m10 = jnp.where(first, zero_row, m10_ref[0, 0])
    m11 = jnp.where(first, zero_row, m11_ref[0, 0])
    n00 = jnp.where(last, zero_row, n00_ref[0, 0])
    n01 = jnp.where(last, zero_row, n01_ref[0, 0])

    a00, a01 = p00_ref[0], p01_ref[0]  # (th, Wp, C), row-parity 0
    a10, a11 = p10_ref[0], p11_ref[0]  # row-parity 1

    # ---- H-axis input transform (B^T rows: d0-d2, d1+d2, d2-d1, d1-d3).
    # Axis tap k: k=0 -> parity-1 rows at offset -1; k=1 -> parity-0 at 0;
    # k=2 -> parity-1 at 0; k=3 -> parity-0 at +1.
    def h_streams(a0, a1, prev1, next0):
        s0 = jnp.concatenate([prev1[None], a1[:-1]], axis=0)
        s3 = jnp.concatenate([a0[1:], next0[None]], axis=0)
        return (s0 - a1, a0 + a1, a1 - a0, a0 - s3)

    t_b0 = h_streams(a00, a10, m10, n00)  # col-parity 0, i = 0..3
    t_b1 = h_streams(a01, a11, m11, n01)  # col-parity 1

    # ---- W-axis transform; same B^T along columns. Col tap l: l=0 ->
    # col-parity 1 at offset -1 (zero col at the left image edge); l=1/2
    # -> parities 0/1 at 0; l=3 -> parity 0 at +1 (zero col at right).
    zero_col = jnp.zeros_like(t_b0[0][:, :1])

    v = []  # V[4i+j], each (th, Wp, C)
    for ti0, ti1 in zip(t_b0, t_b1):
        wl = jnp.concatenate([zero_col, ti1[:, :-1]], axis=1)
        wr = jnp.concatenate([ti0[:, 1:], zero_col], axis=1)
        v.append(wl - ti1)
        v.append(ti0 + ti1)
        v.append(ti1 - ti0)
        v.append(ti0 - wr)

    # ---- 16 MXU dots with fp32 accumulation.
    th_, wp, c = v[0].shape
    co = u_ref.shape[-1]
    m = [
        jnp.dot(
            v[k].reshape(th_ * wp, c),
            u_ref[k],
            preferred_element_type=acc_dtype,
        )
        for k in range(16)
    ]

    # ---- output transform (A^T rows: m0+m1+m2, m1-m2-m3), fp32.
    p_rows = [
        [m[0 + j] + m[4 + j] + m[8 + j] for j in range(4)],  # out parity 0
        [m[4 + j] - m[8 + j] - m[12 + j] for j in range(4)],  # out parity 1
    ]
    bias = bias_ref[0].astype(acc_dtype)

    def emit(o_ref, pr, q, r_ref):
        y = (
            (pr[0 + q] + pr[1 + q] + pr[2 + q])
            if q == 0
            else (pr[1] - pr[2] - pr[3])
        )
        y = y + bias
        if r_ref is not None:
            y = y + r_ref[0].reshape(th_ * wp, co).astype(acc_dtype)
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0] = y.reshape(th_, wp, co).astype(o_ref.dtype)

    r4 = list(r_refs) if has_residual else [None] * 4
    emit(o00_ref, p_rows[0], 0, r4[0])
    emit(o01_ref, p_rows[0], 1, r4[1])
    emit(o10_ref, p_rows[1], 0, r4[2])
    emit(o11_ref, p_rows[1], 1, r4[3])


def _pick_th(hp: int, wp: int, c: int, co: int) -> int:
    """Largest tile-row block that divides Hp and keeps the working set
    (V bf16 + M fp32 + in/out blocks, x2 pipeline margin) under ~12 MB."""
    for th in (16, 12, 8, 6, 4, 3, 2, 1):
        if hp % th:
            continue
        v_bytes = 16 * th * wp * c * 2
        m_bytes = 16 * th * wp * co * 4
        io_bytes = 4 * th * wp * (c + co) * 2 * 2
        if v_bytes + m_bytes + io_bytes < 12 * 1024 * 1024:
            return th
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("relu", "interpret", "th", "acc_dtype"),
)
def winograd_conv3x3_phases(
    phases: Tuple[jnp.ndarray, ...],
    u: jnp.ndarray,
    bias: jnp.ndarray,
    residual_phases: Optional[Tuple[jnp.ndarray, ...]] = None,
    relu: bool = True,
    interpret: bool | None = None,
    th: Optional[int] = None,
    acc_dtype=jnp.float32,
):
    """Fused Winograd 3x3 stride-1 pad-1 conv in phase space.

    phases: 4x (B, Hp, Wp, C) from :func:`space_to_phases`.
    u: (16, C, Co) from :func:`transform_weights` (any float dtype; cast
       to the phase dtype for the MXU).
    bias: (Co,) — the BN-folded conv bias (models/folded.py semantics).
    residual_phases: optional 4x (B, Hp, Wp, Co) added before the relu
       (the BasicBlock shortcut, fused).
    Returns 4 phase arrays (B, Hp, Wp, Co) of the conv output.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p00 = phases[0]
    b, hp, wp, c = p00.shape
    co = u.shape[-1]
    dtype = p00.dtype
    if th is None:
        th = _pick_th(hp, wp, c, co)
    n_h = hp // th

    u = u.astype(dtype)
    bias2 = bias.reshape(1, co).astype(jnp.float32)

    blk = pl.BlockSpec(
        (1, th, wp, c), lambda bb, ii: (bb, ii, 0, 0), memory_space=pltpu.VMEM
    )
    # Halo views index single rows; row-block index = element row because
    # the block is one row tall. Clamped to the valid range — the kernel
    # masks the out-of-range cases to the zero pad.
    next_row = pl.BlockSpec(
        (1, 1, wp, c),
        lambda bb, ii, _th=th, _hp=hp: (bb, jnp.minimum((ii + 1) * _th, _hp - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    prev_row = pl.BlockSpec(
        (1, 1, wp, c),
        lambda bb, ii, _th=th: (bb, jnp.maximum(ii * _th - 1, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    full = pl.BlockSpec(
        u.shape, lambda bb, ii: (0, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (1, co), lambda bb, ii: (0, 0), memory_space=pltpu.VMEM
    )
    out_blk = pl.BlockSpec(
        (1, th, wp, co), lambda bb, ii: (bb, ii, 0, 0), memory_space=pltpu.VMEM
    )

    in_specs = [blk] * 4 + [next_row, next_row, prev_row, prev_row, full, bias_spec]
    operands = list(phases) + list(phases[:2]) + list(phases[2:]) + [u, bias2]
    has_residual = residual_phases is not None
    if has_residual:
        r_blk = pl.BlockSpec(
            (1, th, wp, co),
            lambda bb, ii: (bb, ii, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs += [r_blk] * 4
        operands += list(residual_phases)

    out_shape = [jax.ShapeDtypeStruct((b, hp, wp, co), dtype)] * 4
    kernel = functools.partial(
        _wino_kernel,
        th=th,
        n_h=n_h,
        relu=relu,
        has_residual=has_residual,
        acc_dtype=acc_dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(b, n_h),
        in_specs=in_specs,
        out_specs=[out_blk] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return tuple(outs)


def winograd_conv3x3(
    x: jnp.ndarray,
    g: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,
    relu: bool = True,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Convenience standard-layout wrapper (split -> kernel -> interleave).

    For chained use (a ResNet stage) call the phase-space form directly
    so the split/interleave passes amortize over the chain.
    """
    co = g.shape[-1]
    u = transform_weights(g)
    if bias is None:
        bias = jnp.zeros((co,), jnp.float32)
    phases = space_to_phases(x)
    res = space_to_phases(residual) if residual is not None else None
    outs = winograd_conv3x3_phases(
        phases, u, bias, residual_phases=res, relu=relu, interpret=interpret
    )
    return phases_to_space(outs)


def conv3x3_reference(
    x: jnp.ndarray,
    g: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    residual: Optional[jnp.ndarray] = None,
    relu: bool = True,
) -> jnp.ndarray:
    """jnp oracle: direct stride-1 pad-1 conv (+bias/residual/relu)."""
    y = jax.lax.conv_general_dilated(
        x,
        g.astype(x.dtype),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    if residual is not None:
        y = y + residual
    if relu:
        y = jnp.maximum(y, 0)
    return y
