"""Pallas TPU kernel: fused decoder tail — packed upconv_0_0, the
double-packed collapsed upconv_0_1, and both ELUs in ONE VMEM pass
(y1p → double-packed y0pp).

Why: with the collapsed decoder (ops/collapsed.py) the judged-config
tail still spends most of its time materializing intermediates: the
packed u00 conv writes zp (453 MB at b128), depth_to_space rewrites it,
and the collapsed u01 conv reads it back plus an edge-pad copy — ~6 ms
of pure HBM traffic between two MXU ops. This kernel keeps the chain in
VMEM: per row-block it reads a haloed y1p tile, runs

    zp   = ELU(conv3x3_edge(y1p, pack(k00)))          # (TH+2, W, 64)
    y0pp = ELU(conv3x3_edge(zp, pack(collapse(k01)))) # (TH, W, 256)

and writes only y0pp (double-packed: Mosaic cannot lower the rank-5
vector reshape an in-register depth-to-space needs, so the downstream
dispconv consumes the double-packed layout directly — see
ops/collapsed.py pad_packed_edge). The u01 conv runs DOUBLE-packed — the collapse
(3,3,16,64) kernel composed with one more packing — because a C=16
intermediate would waste 7/8 of the VMEM lanes; the extra 4x structural
zeros cost ~0.6 ms of MXU time but keep every operand ≥64 lanes. All
accumulation fp32 (same policy as ops/pallas/conv_block.py).

Border semantics: stage 1 (pack of the reflect-padded u00) carries the
packed-EDGE border of the ops/packed.py lemma, built in-register from
single-row halo windows — the same 3-window trick as conv_block.py but
with TWO halo rows per side (two chained 3x3 convs). Stage 2 packs a
conv whose own border is EDGE (the collapse image of the full-res
reflect), and the reflect↔edge lemma does NOT transfer: its halo needs
channel-group DUPLICATION (see the in-kernel comment), derived here and
pinned against the XLA oracle by tests/test_fused_tail.py.

The chain is inference-only (the training path keeps the standard
decoder), so no custom VJP is defined; ops/collapsed.py remains the
jnp oracle (tests/test_fused_tail.py pins interpret-mode equality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _elu(x):
    # Mosaic has no expm1 lowering; exp-1 in fp32 is within 1 ulp of the
    # bf16 output resolution (same note as conv_block.py).
    return jnp.where(x > 0, x, jnp.exp(x) - 1.0)


def _conv3x3_acc(tile, w9, dtype):
    """VALID 3x3 conv over a (R+2, W+2, Cin) tile → (R, W, Cout) fp32.

    Nine per-tap dots. For Cin < 128 each dot wastes the contraction
    dimension (the measured half-utilization of stage 2 — BASELINE.md);
    the im2col fix (concat the nine shifted patches on lanes, contract
    once at K=9*Cin) was tried and does NOT lower: Mosaic rejects the
    lane-dim `tpu.concatenate` of shifted sub-lane-phase slices (it
    compiles in interpret mode only). Kept per-tap; the kernel stays
    opt-in behind ops/collapsed.set_use_fused_tail.
    """
    r = tile.shape[0] - 2
    width = tile.shape[1] - 2
    acc = None
    for ky in range(3):
        for kx in range(3):
            patch = tile[ky : ky + r, kx : kx + width, :]
            part = jax.lax.dot_general(
                patch,
                w9[ky * 3 + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
    return acc


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
    w00_ref,  # (9, C1, C0)   pack(k00)
    b00_ref,  # (1, C0)
    w01_ref,  # (9, C0, C00)  pack(collapse(k01))
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

    # ---- stage 1: zp = ELU(conv_edge(y1p, k00)) over TH+2 rows --------
    # The u01 conv needs zp with a 1-row halo, so compute zp on rows
    # [i*TH-1, (i+1)*TH] — which needs y1p rows [i*TH-2, (i+1)*TH+1].
    # Edge border: block 0's halo rows clamp to row 0 (and the last
    # block's to row H-1) — exactly what the clamped index maps deliver;
    # in-range blocks get the true neighbor rows.
    top = jnp.concatenate([prev2_ref[0], prev1_ref[0]], axis=0)
    bottom = jnp.concatenate([next1_ref[0], next2_ref[0]], axis=0)
    tile = jnp.concatenate([top, cur, bottom], axis=0)  # (TH+4, W, C1)
    tile = _edge_cols(tile, width)  # (TH+4, W+2, C1)

    zp = _elu(_conv3x3_acc(tile, w00_ref[:], dtype) + b00_ref[0]).astype(dtype)
    # zp: (TH+2, W, C0) = rows [i*TH-1, (i+1)*TH] of the zp plane.
    # Rows outside the image (block 0 / last block) hold edge-clamped
    # garbage — stage 2's border rule REPLACES them (see below).
    c0s2 = zp.shape[-1]

    # ---- stage 2: the double-packed u01 conv over TH rows -------------
    # Border rule: the u01-collapsed conv carries an EDGE border at the
    # half-res (z) level, and the reflect↔edge lemma of ops/packed.py is
    # REFLECT-specific — packing an edge-bordered conv needs a channel-
    # group-DUPLICATED halo instead of plain edge: the top halo row is
    # only read at its α=1 slot, which must hold z row -1 ≡ edge ≡ z row
    # 0 = packed row 0's α=0 group — i.e. the halo is packed row 0 with
    # its α=0 half duplicated into both α slots (bottom: α=1 half; left/
    # right columns: the β=0 / β=1 groups). Interior halos are the true
    # neighbor rows (zp is computed with one extra row each side).
    half = c0s2 // 2
    q = c0s2 // 4

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
    # Column halos: β-group duplication (applies at every row block).
    left = zt[:, :1]
    left = jnp.concatenate(
        [left[..., 0:q], left[..., 0:q], left[..., 2 * q : 3 * q],
         left[..., 2 * q : 3 * q]],
        axis=-1,
    )
    right = zt[:, width - 1 : width]
    right = jnp.concatenate(
        [right[..., q : 2 * q], right[..., q : 2 * q],
         right[..., 3 * q : 4 * q], right[..., 3 * q : 4 * q]],
        axis=-1,
    )
    zt = jnp.concatenate([left, zt, right], axis=1)  # (TH+2, W+2, C0)

    y0pp = _elu(_conv3x3_acc(zt, w01_ref[:], dtype) + b01_ref[0])
    # (TH, W, C00) fp32; C00 = 4 * C0out groups, g-major. Written double-
    # packed as-is: Mosaic cannot lower the rank-5 vector reshape a
    # depth-to-space needs, and the downstream dispconv consumes the
    # double-packed layout directly (ops/collapsed.py pad_packed_edge).
    out_ref[0] = y0pp.astype(out_ref.dtype)


def _pick_th(height: int, width: int, c1: int, c0: int, c00: int, esize: int):
    """Largest row tile (at the packed H/4 grid) fitting ~12 MB VMEM."""

    def fits(th: int) -> bool:
        lane = lambda c: -(-c // 128) * 128
        per_row = width * (
            2 * lane(c1) * esize  # input block window (double-buffered)
            + lane(c0) * 4  # zp fp32 accumulator
            + lane(c0) * esize  # zp cast tile
            + lane(c00) * 4  # y0pp fp32
            + 2 * lane(c00) * esize  # output window (double-buffered)
        )
        halo = 8 * width * lane(c1) * esize
        return th * per_row + halo <= 12 * 1024 * 1024

    for th in (16, 8, 4, 2):
        if height % th == 0 and height // th >= 2 and fits(th):
            return th
    return 0


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_tail_pallas(
    y1p: jnp.ndarray,  # (B, H4, W4, C1)
    w00p: jnp.ndarray,  # (3, 3, C1, C0)   pack(k00)
    b00: jnp.ndarray,  # (C0,)            tiled bias
    w01pp: jnp.ndarray,  # (3, 3, C0, C00)  pack(collapse(k01))
    b01: jnp.ndarray,  # (C00,)           tiled bias
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y1p (packed level-1 output) → y0pp (DOUBLE-packed u01 output) at
    (B, H4, W4, C00); depth_to_space twice recovers the full-res plane.

    interpret=None → auto: compiled on TPU, interpreter elsewhere (same
    convention as the correlation kernel)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h4, w4, c1 = y1p.shape
    c0 = w00p.shape[-1]
    c00 = w01pp.shape[-1]
    th = _pick_th(h4, w4, c1, c0, c00, y1p.dtype.itemsize)
    if th == 0:
        raise ValueError(f"H4={h4} not tileable; use the XLA path")
    n_blocks = h4 // th

    w00 = w00p.reshape(9, c1, c0).astype(y1p.dtype)
    w01 = w01pp.reshape(9, c0, c00).astype(y1p.dtype)
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
                (9, c1, c0), lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c0), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (9, c0, c00), lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM
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
            flops=2 * b * h4 * w4 * 9 * (c1 * c0 + c0 * c00),
            bytes_accessed=b * h4 * w4 * (c1 + 4 * (c00 // 4)) * y1p.dtype.itemsize,
            transcendentals=b * h4 * w4 * (c0 + c00),
        ),
        interpret=interpret,
    )(y1p, y1p, y1p, y1p, y1p, w00, bk00, w01, bk01)
    return out
