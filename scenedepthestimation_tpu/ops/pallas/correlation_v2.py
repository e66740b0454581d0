"""Pallas TPU kernel, correlation v2: banded Gram on the MXU + log-shear
band extraction (SURVEY C10; the round-1 kernel's documented successor
candidate — ROADMAP r1 #6).

The v1 kernel (ops/pallas/correlation.py) computes, per shift d, an
elementwise product and a LANE reduction over C — D=48 VPU reduction
sweeps that dominate its 8.8 ms at the config-5 shape (the op is only
2.7 GFLOP of useful work; it is pure vector-unit overhead).

v2 observes that the whole cost volume is a BAND of the per-row Gram
matrix:

    G[r, u, j] = Σ_c FL[r, u, c] · FRpad[r, j, c]      (one batched
                                                        dot_general →
                                                        MXU, ~19 GFLOP
                                                        with the band
                                                        waste — ~0.3 ms
                                                        at full util)
    cost[r, u, d] = G[r, u, u + (D-1) - d]             (a sheared band)

The shear is applied in VMEM with the log-roll trick: rolling row u of
G right by (u + D) mod Wp decomposes into log2(W) masked constant rolls
(mask = bit b of the row index, per-sublane select) — after which the
band is the leading D lanes, stored directly.

**Measured outcome (v5e, config-5 shape B16 H96 W288 C64 D48): v2
LOSES — 11.06 ms vs v1's 8.59 (fp32), 9.78 vs 7.51 (bf16), and the
MXU's bf16-MAC fp32 emulation costs max|diff| 2e-3 vs the oracle where
v1's VPU-fp32 products hold 1.2e-7.** The shear's ~10 masked-roll
passes over the 3.5 MB fp32 Gram block replace the VPU reduction
traffic they were meant to remove, and the 7x band waste halves the
row-block size (VMEM). Kept in-tree with its test as the recorded
ROADMAP-#6 experiment; v1 (ops/pallas/correlation.py) remains the
production kernel and its "layout-bound limit" conclusion stands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr2_kernel(fl_ref, fr_ref, out_ref, *, max_disp: int, inv_c: float):
    fl = fl_ref[:]  # (R, W, C)
    frp = fr_ref[:]  # (R, Wp, C): W-REVERSED left-padded F_R (see impl)
    r, w, c = fl.shape
    d = max_disp

    g = jax.lax.dot_general(
        fl,
        frp,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (R, W, Wp); G[u, j] = Σ_c FL[u, c] · FRpad[Wp-1-j, c]

    # Band extraction as a shear. With the REVERSED right view,
    # cost[u, d] = G[u, (Wp-D) - u + d] — i.e. RIGHT-roll row u by
    # (u + D) mod Wp puts the band at lanes [0, D). (The reversal lives
    # in XLA because Mosaic lowers neither `rev` nor negative rolls;
    # with it, every roll here is positive.) Per-row variable roll =
    # log2(W) masked constant rolls (mask on the sublane index); lanes
    # [0, D) never touch wrapped values: j = (Wp-D) - u + d ∈ [0, Wp).
    wp = g.shape[-1]
    g = pltpu.roll(g, d, axis=2)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, g.shape, dimension=1)
    shift = 1
    while shift < w:
        mask = (u_idx & shift) != 0
        g = jnp.where(mask, pltpu.roll(g, shift, axis=2), g)
        shift *= 2

    out_ref[:] = (g[:, :, :d] * inv_c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "interpret"))
def correlation_pallas_v2(
    f_left: jnp.ndarray,
    f_right: jnp.ndarray,
    max_disp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, H, W, C) x2 → (B, H, W, D) mean-correlation cost volume.

    interpret=None → auto (compiled on TPU, interpreter elsewhere)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = f_left.shape
    d = max_disp
    bh = b * h
    fl = f_left.reshape(bh, w, c)
    # Left-pad, then REVERSE along W: the reversal makes every in-kernel
    # roll positive (Mosaic lowers neither `rev` nor negative rolls) and
    # costs nothing here — XLA fuses it into the pad copy.
    fr = jnp.pad(f_right.reshape(bh, w, c), ((0, 0), (d - 1, 0), (0, 0)))
    fr = fr[:, ::-1, :]
    wp = w + d - 1

    rows = 8
    while bh % rows != 0:
        rows //= 2
    esize = fl.dtype.itemsize
    # Live VMEM: inputs + FOUR fp32 Gram-sized tensors (g, the rolled
    # copy inside the select, the int32 row-index iota, headroom for the
    # mask/select temporaries — measured: 2x undercounts and trips the
    # 16 MB scoped limit) + the out block.
    lane = lambda n: -(-n // 128) * 128
    vmem = rows * (
        (w * c + wp * c) * esize + w * lane(wp) * 4 * 4 + w * lane(d) * 4
    )
    while vmem > 10 * 1024 * 1024 and rows > 1:
        rows //= 2
        vmem //= 2

    grid = (bh // rows,)
    out = pl.pallas_call(
        functools.partial(_corr2_kernel, max_disp=d, inv_c=1.0 / c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, wp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, w, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, w, d), f_left.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * w * wp * c,
            bytes_accessed=(2 * bh * w * c + bh * w * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fl, fr)
    return out.reshape(b, h, w, d)
