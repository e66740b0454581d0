"""Pallas TPU kernel: fused decoder tail v2 — aligned phase-split dots
(the round-3 revival of the recorded im2col candidate).

Why v1 lost (BASELINE.md round-2): its stages ran 9 separate per-tap
dots — stage 2 at K=64 (half a 128-lane MXU contraction) — ~27 MXU
pass-units per row block where ~8 carry the useful work. The straight
im2col fix (lane-concat the 9 shifted patches) does NOT lower: Mosaic
rejects lane-dim concatenation of sublane-phase-shifted (W-shifted)
slices.

What this kernel does instead — three moves, ALL tile-aligned (a first
cut that phase-split the outputs into 64/32-lane groups measured 57 ms:
Mosaic's masked sub-tile lane stores and offset-layout relayouts cost
more than the MXU passes they save; every op below keeps offset-(0,0)
layouts):

1. **ky merged into K by row-offset lane-concat.** Slices differing
   only in the leading (non-tiled) row dim share sublane phase, so
   their lane concat is legal: stage 1 contracts at K=3*C1=384 (full
   chunks), stage 2 at K=2*C0=128.
2. **Row-phase splitting drops stage 2's zero tap rows exactly.** A
   packed kernel's tap rows are {a, a+1} for output row-parity a
   (ops/packed.py: u = 2p + alpha - a must land in [-1, 1]), so per-a
   dots carry no dy-zeros, and phase a's output groups are the
   CONTIGUOUS 128-lane half of y0pp — concat of two aligned halves.
3. **dx-union kernels:** per column tap dx, one kernel slice holds BOTH
   column-phase groups (the invalid (dx, b) blocks are w01pp's own
   structural zeros), so N=128 full fill and the column shift lives on
   the INPUT patch (sublane shift — the same op v1 lowered fine).

Pass-unit accounting at the judged shapes (C1=128, C0=64, C00=256):
stage 1 = 3 dots (K=384, N=64) = 9 units; stage 2 = 2 phases x 3 dots
(K=128, N=128) = 6 units — 15 vs v1's 27 for identical math.

Halo construction, border rules (edge for stage 1, the channel-group
duplication lemma for stage 2), grid layout, and the output contract
(DOUBLE-packed y0pp, no in-kernel d2s) are v1's, unchanged;
tests/test_fused_tail_v2.py pins interpret-mode equality against the
same XLA oracle. Inference-only, like v1 (training keeps the standard
decoder), so no custom VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    # Mosaic has no expm1 lowering; exp-1 in fp32 is within 1 ulp of the
    # bf16 output resolution (same note as conv_block.py / fused_tail).
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def stage1_dx_kernels(w00p: jnp.ndarray) -> jnp.ndarray:
    """pack(k00) (3, 3, C1, C0) → (3, 3*C1, C0): per column tap dx, the
    dy-major im2row matrix (K = all three tap rows lane-concatenated)."""
    c1, c0 = w00p.shape[2], w00p.shape[3]
    return jnp.stack(
        [w00p[:, dx].reshape(3 * c1, c0) for dx in range(3)]
    )


def stage2_phase_kernels(w01pp: jnp.ndarray) -> jnp.ndarray:
    """pack(collapse(k01)) (3, 3, C0, C00) → (2, 3, 2*C0, C00//2):
    per output row-phase a and column tap dx, the dense dy-window
    (rows {a, a+1}) matrix emitting phase a's CONTIGUOUS output half
    (groups 2a, 2a+1). The (dx, b) validity zeros are w01pp's own."""
    c0, c00 = w01pp.shape[2], w01pp.shape[3]
    q = c00 // 4
    mats = []
    for a in (0, 1):
        row = []
        for dx in range(3):
            sl = w01pp[a : a + 2, dx, :, 2 * a * q : (2 * a + 2) * q]
            row.append(sl.reshape(2 * c0, 2 * q))
        mats.append(jnp.stack(row))
    return jnp.stack(mats)


def _dot(x, w):
    return jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _edge_cols(tile, width):
    """Append edge-replicated border columns: (R, W, C) → (R, W+2, C)."""
    return jnp.concatenate(
        [tile[:, :1], tile, tile[:, width - 1 : width]], axis=1
    )


def _kernel(
    prev2_ref,  # (1, 1, W, C1)  row i*TH-2 (clamped)
    prev1_ref,  # (1, 1, W, C1)  row i*TH-1 (clamped)
    cur_ref,  # (1, TH, W, C1)
    next1_ref,  # (1, 1, W, C1)  row (i+1)*TH (clamped)
    next2_ref,  # (1, 1, W, C1)  row (i+1)*TH+1 (clamped)
    w1_ref,  # (3, 3*C1, C0)        stage1_dx_kernels
    b00_ref,  # (1, C0)
    w2_ref,  # (2, 3, 2*C0, C00//2) stage2_phase_kernels
    b01_ref,  # (1, C00)
    out_ref,  # (1, TH, W, C00)  double-packed y0pp
    *,
    th: int,
    width: int,
):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    cur = cur_ref[0]  # (TH, W, C1)
    dtype = cur.dtype

    # ---- stage 1: zp rows [i*TH-1, (i+1)*TH] from y1p rows ±2 ---------
    # Identical window/border construction to v1; only the contraction
    # changed: one K=3*C1 im2row, three dx-shifted input patches.
    top = jnp.concatenate([prev2_ref[0], prev1_ref[0]], axis=0)
    bottom = jnp.concatenate([next1_ref[0], next2_ref[0]], axis=0)
    tile = jnp.concatenate([top, cur, bottom], axis=0)  # (TH+4, W, C1)
    tile = _edge_cols(tile, width)  # (TH+4, W+2, C1)

    r1 = th + 2
    x1 = jnp.concatenate(
        [tile[0:r1], tile[1 : 1 + r1], tile[2 : 2 + r1]], axis=-1
    )  # (TH+2, W+2, 3*C1) — row-offset slices share sublane phase
    acc = None
    for dx in range(3):
        part = _dot(x1[:, dx : dx + width], w1_ref[dx])
        acc = part if acc is None else acc + part
    zp = _elu(acc + b00_ref[0]).astype(dtype)
    # zp: (TH+2, W, C0) = rows [i*TH-1, (i+1)*TH]; out-of-image rows
    # (block 0 / last) hold edge-clamped garbage that stage 2's border
    # rule REPLACES — same contract as v1.
    c0 = zp.shape[-1]

    # ---- stage 2 borders: grouped-duplication halos (v1's lemma) ------
    half = c0 // 2
    qc = c0 // 4

    def dup_lo(v):  # α=0 groups into both α slots
        return jnp.concatenate([v[..., :half], v[..., :half]], axis=-1)

    def dup_hi(v):  # α=1 groups into both α slots
        return jnp.concatenate([v[..., half:], v[..., half:]], axis=-1)

    zp_top = jax.lax.cond(i == 0, lambda: dup_lo(zp[1:2]), lambda: zp[0:1])
    zp_bot = jax.lax.cond(
        i == n_i - 1,
        lambda: dup_hi(zp[th : th + 1]),
        lambda: zp[th + 1 : th + 2],
    )
    zt = jnp.concatenate([zp_top, zp[1 : th + 1], zp_bot], axis=0)
    left = zt[:, :1]
    left = jnp.concatenate(
        [left[..., 0:qc], left[..., 0:qc], left[..., 2 * qc : 3 * qc],
         left[..., 2 * qc : 3 * qc]],
        axis=-1,
    )
    right = zt[:, width - 1 : width]
    right = jnp.concatenate(
        [right[..., qc : 2 * qc], right[..., qc : 2 * qc],
         right[..., 3 * qc : 4 * qc], right[..., 3 * qc : 4 * qc]],
        axis=-1,
    )
    zt = jnp.concatenate([left, zt, right], axis=1)  # (TH+2, W+2, C0)

    # ---- stage 2: per row-phase, K=2*C0 row-concat, dx-union N --------
    halves = []
    for a in (0, 1):
        x2 = jnp.concatenate(
            [zt[a : a + th], zt[a + 1 : a + 1 + th]], axis=-1
        )  # (TH, W+2, 2*C0)
        acc = None
        for dx in range(3):
            part = _dot(x2[:, dx : dx + width], w2_ref[a, dx])
            acc = part if acc is None else acc + part
        halves.append(acc)
    y0pp = _elu(jnp.concatenate(halves, axis=-1) + b01_ref[0])
    # Double-packed, g-major — same output contract as v1 (Mosaic cannot
    # lower the rank-5 d2s reshape; the downstream dispconv consumes the
    # double-packed layout via pad_packed_edge).
    out_ref[0] = y0pp.astype(out_ref.dtype)


def _pick_th(height: int, width: int, c1: int, c0: int, c00: int, esize: int):
    """Largest row tile (at the packed H/4 grid) fitting the VMEM model
    (the kernel raises the scoped limit to 100 MB; see pallas_call)."""

    def fits(th: int) -> bool:
        lane = lambda c: -(-c // 128) * 128
        per_row = width * (
            2 * lane(c1) * esize  # input block window (double-buffered)
            + lane(3 * c1) * esize  # stage-1 im2row operand
            + lane(c0) * 4  # stage-1 fp32 accumulator
            + lane(c0) * esize  # zp cast tile
            + lane(c0) * esize  # zt
            + lane(2 * c0) * esize  # stage-2 row-concat operand
            + 2 * lane(c00 // 2) * 4  # stage-2 fp32 accumulators
            + lane(c00) * 4  # y0pp fp32
            + 2 * lane(c00) * esize  # output window (double-buffered)
        )
        halo = 8 * width * lane(c1) * esize
        return th * per_row + halo <= 48 * 1024 * 1024

    for th in (16, 8, 4, 2):
        if height % th == 0 and height // th >= 2 and fits(th):
            return th
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_tail_pallas_v2(
    y1p: jnp.ndarray,  # (B, H4, W4, C1)
    w00p: jnp.ndarray,  # (3, 3, C1, C0)   pack(k00)
    b00: jnp.ndarray,  # (C0,)            tiled bias
    w01pp: jnp.ndarray,  # (3, 3, C0, C00)  pack(collapse(k01))
    b01: jnp.ndarray,  # (C00,)           tiled bias
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Same contract as fused_tail.fused_tail_pallas: y1p (packed
    level-1 output) → y0pp (DOUBLE-packed u01 output) at
    (B, H4, W4, C00); depth_to_space twice recovers the full-res plane."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h4, w4, c1 = y1p.shape
    c0 = w00p.shape[-1]
    c00 = w01pp.shape[-1]
    th = _pick_th(h4, w4, c1, c0, c00, y1p.dtype.itemsize)
    if th == 0:
        raise ValueError(f"H4={h4} not tileable; use the XLA path")
    n_blocks = h4 // th

    w1 = stage1_dx_kernels(w00p).astype(y1p.dtype)
    w2 = stage2_phase_kernels(w01pp).astype(y1p.dtype)
    bk00 = b00.reshape(1, c0).astype(jnp.float32)
    bk01 = b01.reshape(1, c00).astype(jnp.float32)

    def halo(off_fn):
        return pl.BlockSpec(
            (1, 1, w4, c1),
            lambda bi, i: (bi, off_fn(i), 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, width=w4),
        grid=(b, n_blocks),
        in_specs=[
            halo(lambda i: jnp.maximum(i * th - 2, 0)),
            halo(lambda i: jnp.maximum(i * th - 1, 0)),
            pl.BlockSpec(
                (1, th, w4, c1),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            halo(lambda i: jnp.minimum((i + 1) * th, h4 - 1)),
            halo(lambda i: jnp.minimum((i + 1) * th + 1, h4 - 1)),
            pl.BlockSpec(
                w1.shape, lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c0), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                w2.shape,
                lambda bi, i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c00), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w4, c00),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h4, w4, c00), y1p.dtype),
        cost_estimate=pl.CostEstimate(
            # stage 1 = 3 dots (3C1 x C0), stage 2 = 2x3 dots (2C0 x C00/2)
            flops=2 * b * h4 * w4 * (9 * c1 * c0 + 3 * c0 * c00),
            bytes_accessed=b * h4 * w4 * (c1 + c00) * y1p.dtype.itemsize,
            transcendentals=b * h4 * w4 * (c0 + c00),
        ),
        # Mosaic spills wide temporaries to its vector stack; the 16 MB
        # default scoped limit rejects the judged shape. v5e has 128 MB
        # of physical VMEM — raise the cap instead of shrinking tiles.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(y1p, y1p, y1p, y1p, y1p, w1, bk00, w2, bk01)
    return out
