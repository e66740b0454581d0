"""Pallas TPU kernel, correlation v3: W-TILED banded Gram on the MXU +
in-tile log-shear band extraction (VERDICT r2 next-#7: the correlation
kernel is the stereo path's second-largest stage and both v1 and the
XLA oracle are VPU-reduction-bound, ~5.3-5.8 ms at config-5 b16 bf16
for 2.7 GFLOP of useful work).

v2 (correlation_v2.py) already moved the contraction to the MXU but
computed the FULL per-row Gram (W x Wp = 288 x 335, 7x band waste) and
sheared it with log2(W)=9 masked rolls over that whole block — the roll
traffic replaced the VPU reduction it removed, and v2 lost (11.06 vs
8.59 ms fp32). v3 tiles W into T=128 blocks:

    G_t[u, j'] = Σ_c FL[x0+u, c] · FRwin_t[j', c]     u ∈ [0,128)
    (R x 128 x 175 per tile: band waste 175/48 = 3.65x, not 7x)
    cost[x0+u, d] = G_t[u, 127 - u + d]               (shear)

and the shear is log2(128)=7 masked constant rolls + one static roll
over a (R, 128, 175) block — per useful output element ~2.5x less roll
traffic than v2, on top of the 2x smaller Gram. The per-tile right
windows (175 = T + D - 1 columns, reversed so every in-kernel roll is
positive — Mosaic lowers neither `rev` nor negative rolls) are
pre-gathered in XLA as a (BH, ntiles, 175, C) tensor: the 1.37x copy of
F_R costs one fused HBM pass and makes every Pallas block offset
block-aligned.

MXU products are computed in the INPUT dtype (bf16 in the serving
path; preferred_element_type=fp32 accumulate). v1 upcasts to fp32
before the VPU multiply, so v1-vs-v3 differ by bf16 product rounding:
measured max|cost diff| ~2e-3 on unit-normal features — the disparity
readout impact is what decides serving use (see BASELINE.md round-3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_T = 128  # W-tile (MXU M dimension)


def _corr3_kernel(fl_ref, frw_ref, out_ref, *, max_disp: int, inv_c: float):
    fl = fl_ref[:]  # (R, T, C)
    frw = frw_ref[:][:, 0]  # (R, Tw, C), Tw = T + D - 1, REVERSED windows
    d = max_disp
    g = jax.lax.dot_general(
        fl,
        frw,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (R, T, Tw); G[u, j'] = Σ_c FL[u, c] · FRwin[Tw-1-j', c]
    # Band shear: cost[u, d] = G[u, (T-1) - u + d] = right-roll row u by
    # u + D (mod Tw), then read lanes [0, D). Static roll by D + 7 masked
    # rolls on the bits of u.
    g = pltpu.roll(g, d, axis=2)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, g.shape, dimension=1)
    shift = 1
    while shift < _T:
        mask = (u_idx & shift) != 0
        g = jnp.where(mask, pltpu.roll(g, shift, axis=2), g)
        shift *= 2
    out_ref[:] = (g[:, :, :d] * inv_c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("max_disp", "interpret"))
def correlation_pallas_v3(
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
    nt = -(-w // _T)
    wt = nt * _T
    tw = _T + d - 1

    # Right-pad FL's W to the tile grid (zero rows → garbage cost rows,
    # sliced off at the end — they never feed real outputs).
    fl = jnp.pad(f_left.reshape(bh, w, c), ((0, 0), (0, wt - w), (0, 0)))
    # FRpad[p] = F_R[p - (D-1)], right-padded so the last tile's window
    # is in range: p ∈ [0, wt + d - 1).
    fr = jnp.pad(
        f_right.reshape(bh, w, c), ((0, 0), (d - 1, wt - w), (0, 0))
    )
    # Pre-gathered REVERSED windows: frw[:, t, j', :] = FRpad[t*T + (tw-1-j')].
    frw = jnp.stack(
        [fr[:, t * _T : t * _T + tw, :][:, ::-1, :] for t in range(nt)],
        axis=1,
    )  # (BH, nt, Tw, C)

    rows = 8
    while bh % rows != 0:
        rows //= 2
    esize = fl.dtype.itemsize
    lane = lambda n: -(-n // 128) * 128
    # Live VMEM: fl + frw blocks, ~4 Gram-sized fp32 tensors (g, rolled
    # copy, iota, select headroom — the v2 lesson), out block.
    vmem = rows * (
        (_T * c + tw * c) * esize + _T * lane(tw) * 4 * 4 + _T * lane(d) * 4
    )
    while vmem > 10 * 1024 * 1024 and rows > 1:
        rows //= 2
        vmem //= 2

    grid = (bh // rows, nt)
    out = pl.pallas_call(
        functools.partial(_corr3_kernel, max_disp=d, inv_c=1.0 / c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (rows, _T, c), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (rows, 1, tw, c),
                lambda i, t: (i, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, _T, d), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, wt, d), f_left.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * wt * tw * c,
            bytes_accessed=(2 * bh * wt * c + bh * wt * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fl, frw)
    return out[:, :w, :].reshape(b, h, w, d)
