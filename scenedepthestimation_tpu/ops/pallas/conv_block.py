"""Pallas TPU kernel: fused reflect-pad + 3x3 conv + ELU — the decoder's
ConvBlock (SURVEY C7 hot loop) in ONE VMEM pass.

Why: the jax.profiler trace of the mono program (BASELINE.md "Profile
note") shows the U-Net decoder dominated by XLA `copy` ops (the reflect
pads materialize a padded copy of every full-res activation) and unfused
ELU `compare_select` passes. This kernel reads each row-block plus its
halo rows, builds the reflect border in VMEM registers, runs the 3x3
conv as nine MXU dot_generals with fp32 accumulation, applies bias+ELU,
and writes the output once.

Halo mechanics: Mosaic manual DMA cannot slice the (lane-tiled) channel
axis when C < 128, so x is passed three times — the TH-row block plus
two SINGLE-ROW windows whose 1-row block shape makes arbitrary clamped
row offsets expressible in the index map (i*TH-1 and (i+1)*TH). HBM
reads are ~(1+2/TH)x the input; border blocks substitute the reflected
row in-register.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    prev_ref,  # (1, 1, W, Cin) the single row above this block (clamped)
    cur_ref,  # (1, TH, W, Cin) block i
    next_ref,  # (1, 1, W, Cin) the single row below this block (clamped)
    w_ref,  # (9, Cin, Cout)
    b_ref,  # (1, Cout)
    out_ref,  # (1, TH, W, Cout)
    *,
    th: int,
    width: int,
    activation: str,
    border: str = "reflect",
):
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    cur = cur_ref[0]  # (TH, W, Cin)

    # Row halos at the image borders: reflect (row -1 ≡ row 1, row H ≡
    # row H-2) for the standard ConvBlock, edge replication for the
    # space-to-depth packed convs (ops/packed.py lemma: full-res reflect
    # ≡ packed edge). Halo rows arrive as single-row windows — HBM reads
    # are ~(1 + 2/TH)x the input instead of the 3x a full prev/next-block
    # scheme costs.
    r = 1 if border == "reflect" else 0
    top = jax.lax.cond(
        i == 0,
        lambda: cur[r : r + 1],
        lambda: prev_ref[0],
    )
    bottom = jax.lax.cond(
        i == n_i - 1,
        lambda: cur[th - 1 - r : th - r],
        lambda: next_ref[0],
    )
    tile = jnp.concatenate([top, cur, bottom], axis=0)  # (TH+2, W, Cin)
    # Border columns (reflect or edge).
    tile = jnp.concatenate(
        [tile[:, r : r + 1], tile, tile[:, width - 1 - r : width - r]], axis=1
    )  # (TH+2, W+2, Cin)

    acc = None
    for ky in range(3):
        for kx in range(3):
            patch = tile[ky : ky + th, kx : kx + width, :]
            part = jax.lax.dot_general(
                patch,
                w_ref[ky * 3 + kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TH, W, Cout)
            acc = part if acc is None else acc + part

    acc = acc + b_ref[0].astype(jnp.float32)
    if activation == "elu":
        # Mosaic has no expm1 lowering; exp-1 in fp32 is within 1 ulp of
        # the bf16 output resolution.
        acc = jnp.where(acc > 0, acc, jnp.exp(acc) - 1.0)
    elif activation == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif activation == "sigmoid":
        # fp32 sigmoid head (DispHead policy: bf16 saturates the tails).
        acc = jax.nn.sigmoid(acc)
    out_ref[0] = acc.astype(out_ref.dtype)


def _pick_th(height: int, width: int = 0, cin: int = 0, cout: int = 0,
             esize: int = 2) -> int:
    """Largest row tile whose VMEM footprint fits the ~16 MB budget.

    VMEM pads the lane (channel) axis to 128, so small-C blocks cost
    roundup(C,128)/C more than their logical size; account for the 3
    double-buffered input windows, the double-buffered output, and the
    fp32 accumulator."""

    def fits(th: int) -> bool:
        if not (width and cin and cout):
            return True
        lane = lambda c: -(-c // 128) * 128
        per_row = width * (
            2 * lane(cin) * esize  # TH-row input window, double-buffered
            + 2 * lane(cout) * esize  # output window, double-buffered
            + lane(cout) * 4  # fp32 accumulator
            + 2 * lane(cin) * esize  # padded tile temporary
        )
        halo = 4 * width * lane(cin) * esize  # 2 single-row windows, dbuf
        return th * per_row + halo <= 12 * 1024 * 1024

    for th in (16, 8, 4, 2):
        if height % th == 0 and height // th >= 2 and fits(th):
            return th
    return 0  # no valid tiling → caller falls back


# ---------------------------------------------------------------------------
# Differentiable wrapper + XLA fallback (shared by the Flax module).
# ---------------------------------------------------------------------------


def conv3x3_xla(x, kernel, bias, activation: str = "elu"):
    """Reference semantics: reflect-pad → conv3x3 → bias → activation."""
    y = jax.lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"),
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    if activation == "elu":
        return jax.nn.elu(y)
    if activation == "relu":
        return jax.nn.relu(y)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_fused(x, kernel, bias, activation: str = "elu"):
    """Pallas forward; exact XLA-derived backward (Pallas has no autodiff
    — same failure mode as the correlation kernel, caught on-chip)."""
    return conv3x3_elu_pallas(x, kernel, bias, activation=activation)


def _fused_fwd(x, kernel, bias, activation):
    return conv3x3_fused(x, kernel, bias, activation), (x, kernel, bias)


def _fused_bwd(activation, residuals, g):
    x, kernel, bias = residuals
    _, vjp = jax.vjp(lambda a, k, b: conv3x3_xla(a, k, b, activation), x, kernel, bias)
    return vjp(g)


conv3x3_fused.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(
    jax.jit, static_argnames=("activation", "interpret", "border", "out_dtype")
)
def conv3x3_elu_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    activation: str = "elu",
    interpret: bool = False,
    border: str = "reflect",
    out_dtype=None,
) -> jnp.ndarray:
    """x (B, H, W, Cin), kernel (3, 3, Cin, Cout), bias (Cout) →
    act(conv3x3(pad(x))) as (B, H, W, Cout).

    ``border`` selects reflect (standard ConvBlock) or edge padding (the
    space-to-depth packed convs of ops/packed.py)."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    out_dtype = out_dtype or x.dtype
    th = _pick_th(h, w, cin, cout, x.dtype.itemsize)
    if th == 0:
        raise ValueError(f"H={h} not tileable; use the XLA fallback")
    n_blocks = h // th

    wk = kernel.reshape(9, cin, cout).astype(x.dtype)
    bk = bias.reshape(1, cout).astype(jnp.float32)

    def block(bi, i):
        return (bi, i, 0, 0)

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, th=th, width=w, activation=activation, border=border
        ),
        grid=(b, n_blocks),
        in_specs=[
            # Single-row halo windows: with a 1-row block shape the index
            # map addresses ROWS, so arbitrary (clamped) row offsets are
            # expressible — unlike TH-row blocks, which only tile.
            pl.BlockSpec(
                (1, 1, w, cin),
                lambda bi, i: (bi, jnp.maximum(i * th - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, th, w, cin), block, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, w, cin),
                lambda bi, i: (bi, jnp.minimum((i + 1) * th, h - 1), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9, cin, cout), lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, cout), lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, cout), block, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=(b * h * w * (cin + cout)) * x.dtype.itemsize,
            transcendentals=b * h * w * cout,
        ),
        interpret=interpret,
    )(x, x, x, wk, bk)
    return out
