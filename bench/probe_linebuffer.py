"""Feasibility probe for the line-buffered multi-stage tail kernel
(ROADMAP r3 "recorded, not scheduled"; VERDICT r3 next-#4).

The line-buffer hypothesis: v2's 22.6 ms (vs its ~4.4 ms MXU floor and
the ~11 ms XLA production span) is block-structure overhead that larger
sequential blocks with carried rows would amortize. Before building the
full skewed-stage kernel, this probe measures the two quantities that
decide it:

1. **th sweep** — v2 at row-block 4/8/16/24/32. If time is ~flat in th,
   the cost is per-ROW VPU work (im2row lane-concat copies, fp32
   accumulator padding), which line-buffering does NOT remove; if it
   falls steeply with th, block overhead dominates and carrying rows
   across blocks is worth building.
2. **stage split** — a stage-1-only kernel (same window DMAs, same
   im2row, write zp) vs the full kernel: separates stage-1 cost
   (which a line buffer would shave by the 2-halo-row recompute,
   2/(th+2)) from stage-2 + output cost.

Usage: python -u bench/probe_linebuffer.py [batch] [iters]
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scenedepthestimation_tpu.ops.pallas import fused_tail_v2 as V2


def timeit(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def _stage1_kernel(
    prev2_ref, prev1_ref, cur_ref, next1_ref, next2_ref,
    w1_ref, b00_ref, out_ref, *, th, width,
):
    """v2's stage 1 verbatim (same DMAs, same im2row dot), zp out."""
    cur = cur_ref[0]
    dtype = cur.dtype
    top = jnp.concatenate([prev2_ref[0], prev1_ref[0]], axis=0)
    bottom = jnp.concatenate([next1_ref[0], next2_ref[0]], axis=0)
    tile = jnp.concatenate([top, cur, bottom], axis=0)
    tile = V2._edge_cols(tile, width)
    r1 = th + 2
    x1 = jnp.concatenate(
        [tile[0:r1], tile[1 : 1 + r1], tile[2 : 2 + r1]], axis=-1
    )
    acc = None
    for dx in range(3):
        part = V2._dot(x1[:, dx : dx + width], w1_ref[dx])
        acc = part if acc is None else acc + part
    zp = V2._elu(acc + b00_ref[0]).astype(dtype)
    out_ref[0] = zp[1 : th + 1]


@functools.partial(jax.jit, static_argnames=("th",))
def stage1_only(y1p, w00p, b00, th):
    b, h4, w4, c1 = y1p.shape
    c0 = w00p.shape[-1]
    n_blocks = h4 // th
    w1 = V2.stage1_dx_kernels(w00p).astype(y1p.dtype)
    bk00 = b00.reshape(1, c0).astype(jnp.float32)

    def halo(off_fn):
        return pl.BlockSpec(
            (1, 1, w4, c1), lambda bi, i: (bi, off_fn(i), 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        functools.partial(_stage1_kernel, th=th, width=w4),
        grid=(b, n_blocks),
        in_specs=[
            halo(lambda i: jnp.maximum(i * th - 2, 0)),
            halo(lambda i: jnp.maximum(i * th - 1, 0)),
            pl.BlockSpec(
                (1, th, w4, c1), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            halo(lambda i: jnp.minimum((i + 1) * th, h4 - 1)),
            halo(lambda i: jnp.minimum((i + 1) * th + 1, h4 - 1)),
            pl.BlockSpec(w1.shape, lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c0), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w4, c0), lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h4, w4, c0), y1p.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(y1p, y1p, y1p, y1p, y1p, w1, bk00)[:]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(0)
    h4, w4, c1, c0, c00 = 96, 288, 128, 64, 256
    y1p = jnp.asarray(
        rng.normal(0, 1, (b, h4, w4, c1)).astype(np.float32)
    ).astype(jnp.bfloat16)
    k00 = jnp.asarray(rng.normal(0, 0.1, (3, 3, c1, c0)), jnp.float32)
    b00 = jnp.asarray(rng.normal(0, 0.1, (c0,)), jnp.float32)
    k01 = jnp.asarray(rng.normal(0, 0.1, (3, 3, c0, c00)), jnp.float32)
    b01 = jnp.asarray(rng.normal(0, 0.1, (c00,)), jnp.float32)

    # --- th sweep of the full v2 kernel -------------------------------
    orig_pick = V2._pick_th
    for th in (4, 8, 16, 24, 32):
        if h4 % th:
            continue
        V2._pick_th = lambda *a, _th=th: _th
        try:
            @jax.jit
            def run(y1p, n):
                def body(i, acc):
                    x = y1p + (i % 3).astype(y1p.dtype) * jnp.bfloat16(1e-2)
                    out = V2.fused_tail_pallas_v2(
                        x, k00, b00, k01, b01, interpret=False
                    )
                    return acc + out.astype(jnp.float32).mean()

                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            ms = timeit(lambda y, n: run(y, n), (y1p,), iters) * 1e3
            print(f'{{"variant": "v2 full", "th": {th}, "ms": {ms:.2f}}}',
                  flush=True)
        except Exception as e:
            print(f'{{"variant": "v2 full", "th": {th}, '
                  f'"error": "{type(e).__name__}: {str(e)[:120]}"}}',
                  flush=True)
        finally:
            V2._pick_th = orig_pick

    # --- stage-1-only kernel ------------------------------------------
    for th in (8, 16, 32):
        if h4 % th:
            continue
        try:
            @jax.jit
            def run1(y1p, n):
                def body(i, acc):
                    x = y1p + (i % 3).astype(y1p.dtype) * jnp.bfloat16(1e-2)
                    out = stage1_only(x, k00, b00, th)
                    return acc + out.astype(jnp.float32).mean()

                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            ms = timeit(lambda y, n: run1(y, n), (y1p,), iters) * 1e3
            print(f'{{"variant": "stage1 only", "th": {th}, "ms": {ms:.2f}}}',
                  flush=True)
        except Exception as e:
            print(f'{{"variant": "stage1 only", "th": {th}, '
                  f'"error": "{type(e).__name__}: {str(e)[:120]}"}}',
                  flush=True)


if __name__ == "__main__":
    main()
