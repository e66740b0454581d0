"""Pallas TPU kernel: 1-D correlation cost volume (SURVEY C10 — the
flagship native kernel; north-star hot-op #2).

Why a kernel: the jnp shift-and-reduce oracle materializes D shifted
elementwise products — XLA fuses the arithmetic but re-streams the right
feature map from HBM once per shift (D ≈ 48x HBM traffic on the hottest
op of the stereo stack). Here each grid step loads one row-block of
F_L and the left-padded F_R into VMEM ONCE and computes all D shifts
from VMEM, writing the (rows, W, D) cost block back — HBM traffic drops
from O(D·HW·C) to O(HW·C + HW·D).

Implementation notes:
* Inputs are reshaped to (B*H, W, C) rows; one grid step owns
  ``rows_per_block`` rows (sublane-aligned), the full W extent, all C.
* The shift loop is a statically UNROLLED Python loop with a per-d
  store, so each (rows, W, C) product dies as soon as its (rows, W)
  reduction is written. (A trailing jnp.stack keeps all D products live
  → 59 MB scoped VMEM OOM at config-5 shape; a fori_loop would need a
  dynamic lane store, which Mosaic requires to be 128-aligned.)
* fp32 accumulation regardless of input dtype (bf16-safe, SURVEY §7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(fl_ref, fr_ref, out_ref, *, max_disp: int, inv_c: float):
    fl = fl_ref[:].astype(jnp.float32)  # (R, W, C)
    w = fl.shape[1]
    # Statically-unrolled shift loop with a per-d store: each (R, W, C)
    # product dies right after its (R, W) reduction is written, keeping
    # the VMEM stack at ~one product (a jnp.stack at the end keeps all D
    # products live → 59 MB scoped OOM at config-5 shape; a fori_loop
    # needs a dynamic lane store, which Mosaic requires to be
    # 128-aligned).
    for d in range(max_disp):
        start = max_disp - 1 - d
        fr_d = fr_ref[:, start : start + w, :].astype(jnp.float32)
        cost_d = jnp.sum(fl * fr_d, axis=-1) * inv_c  # (R, W)
        out_ref[:, :, d] = cost_d.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# SPMD partitioning: a pallas_call lowers to an opaque custom-call, which
# GSPMD cannot partition — under a batch-sharded jit it would all-gather
# the inputs and replicate the work on every chip (caught by HLO
# inspection on the virtual mesh; would silently break config-5 scaling).
# The op is embarrassingly parallel over B and H (shifts run along W,
# reduction along C), so declare exactly that via custom_partitioning:
# keep whatever sharding B/H carry, force W/C replicated, run the kernel
# per-shard.
# ---------------------------------------------------------------------------


def _bh_only(sharding, ndim=4):
    """Project a NamedSharding onto dims (B, H): W, C replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = list(sharding.spec) + [None] * (ndim - len(sharding.spec))
    return NamedSharding(sharding.mesh, P(spec[0], spec[1], None, None))


def _corr_infer_sharding(max_disp, interpret, mesh, arg_shapes, result_shape):
    return _bh_only(arg_shapes[0].sharding)


def _corr_partition(max_disp, interpret, mesh, arg_shapes, result_shape):
    arg_shardings = (_bh_only(arg_shapes[0].sharding),) * 2
    result_sharding = _bh_only(arg_shapes[0].sharding)

    def lower_fn(fl, fr):
        return _correlation_pallas_impl(fl, fr, max_disp, interpret)

    return mesh, lower_fn, result_sharding, arg_shardings


from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402


@functools.partial(custom_partitioning, static_argnums=(2, 3))
def correlation_pallas(
    f_left: jnp.ndarray,
    f_right: jnp.ndarray,
    max_disp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """interpret=None → auto: compiled on TPU, interpreter elsewhere (so
    the kernel path — including its SPMD partitioning — is exercisable on
    the CPU test mesh)."""
    return _correlation_pallas_impl(f_left, f_right, max_disp, interpret)


# Shardy (the default partitioner in this JAX) consumes an einsum-like
# rule instead of the callbacks. B and H are shared factors (shardings
# propagate — embarrassingly parallel); W/C/D get OPERAND-LOCAL factor
# names so a W- or C-sharding never propagates into the kernel: Shardy
# resolves such inputs by gathering just that axis, which is correct
# (the shift window needs the full W extent per shard).
correlation_pallas.def_partition(
    infer_sharding_from_operands=_corr_infer_sharding,
    partition=_corr_partition,
    sharding_rule="b h w1 c1, b h w2 c2 -> b h w3 d",
)


@functools.partial(jax.jit, static_argnames=("max_disp", "interpret"))
def _correlation_pallas_impl(
    f_left: jnp.ndarray,
    f_right: jnp.ndarray,
    max_disp: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(B, H, W, C) x2 → (B, H, W, D) cost volume, D = max_disp."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = f_left.shape
    d = max_disp
    bh = b * h
    fl = f_left.reshape(bh, w, c)
    # Zero-pad F_R on the left of W once in HBM; kernel slices from VMEM.
    fr = jnp.pad(f_right.reshape(bh, w, c), ((0, 0), (d - 1, 0), (0, 0)))

    # Rows per block: sublane-friendly, bounded by a VMEM budget.
    rows = 8
    while bh % rows != 0:
        rows //= 2
    # Live VMEM per step: fl + fr_pad (input dtype) + one fp32 product +
    # the fp32 out block.
    esize = fl.dtype.itemsize
    vmem = rows * ((w * c + (w + d - 1) * c) * esize + w * c * 4 + w * d * 4)
    while vmem > 8 * 1024 * 1024 and rows > 1:
        rows //= 2
        vmem //= 2

    grid = (bh // rows,)
    out = pl.pallas_call(
        functools.partial(_corr_kernel, max_disp=d, inv_c=1.0 / c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (rows, w + d - 1, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, w, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, w, d), f_left.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * w * d * c,
            bytes_accessed=(2 * bh * w * c + bh * w * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fl, fr)
    return out.reshape(b, h, w, d)
