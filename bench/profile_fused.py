"""Per-piece timing of the fused decoder tail vs the XLA chain
(b128 bf16, judged-config shapes). Decides the fused-tail default.

Usage: python -u bench/profile_fused.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops import collapsed, packed
from scenedepthestimation_tpu.ops.pallas.fused_tail import fused_tail_pallas


def timeit(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def loop(fn):
    @jax.jit
    def t(x, n):
        def body(i, acc):
            y = fn(x + (i.astype(jnp.float32) * 1e-6).astype(x.dtype))
            return acc + y.mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = jnp.bfloat16
    h4, w4 = 96, 288
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)

    y1p = jax.random.normal(ks[0], (b, h4, w4, 128), dtype)
    y0pp = jax.random.normal(ks[1], (b, h4, w4, 256), dtype)
    y0p = jax.random.normal(ks[2], (b, 2 * h4, 2 * w4, 64), dtype)
    k00 = jax.random.normal(ks[3], (3, 3, 32, 16), dtype) * 0.1
    b00 = jnp.zeros((16,), dtype)
    k01 = jax.random.normal(ks[4], (3, 3, 16, 16), dtype) * 0.1
    b01 = jnp.zeros((16,), dtype)
    kd = jax.random.normal(ks[5], (3, 3, 16, 1), dtype) * 0.1
    bd = jnp.zeros((1,), dtype)
    jax.block_until_ready((y1p, y0pp, y0p))
    print("staged", flush=True)

    w00p = packed.pack_conv3x3_kernel(k00)
    w01pp = packed.pack_conv3x3_kernel(collapsed.collapse_upsample_conv_kernel(k01))
    kdp = packed.pack_conv3x3_kernel(kd)
    kd2 = packed.pack_conv3x3_kernel(kdp)

    def xla_chain(y1p):
        zp = jax.nn.elu(
            collapsed.conv3x3_edge(y1p, w00p) + jnp.tile(b00, 4)
        )
        z = packed.depth_to_space(zp)
        return jax.nn.elu(
            collapsed.conv3x3_edge(
                z, collapsed.collapse_upsample_conv_kernel(k01)
            )
            + jnp.tile(b01, 4)
        )

    def disp_packed(y0p):
        dp = collapsed.conv3x3_edge(y0p, kdp)
        return packed.depth_to_space(
            jax.nn.sigmoid((dp + jnp.tile(bd, 4)).astype(jnp.float32))
        )

    def disp_double(y0pp):
        dp2 = lax.conv_general_dilated(
            collapsed.pad_packed_edge(y0pp),
            kd2,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        dp2 = jax.nn.sigmoid((dp2 + jnp.tile(bd, 16)).astype(jnp.float32))
        return packed.depth_to_space(packed.depth_to_space(dp2))

    cases = [
        ("fused kernel y1p->y0pp   ",
         lambda x: fused_tail_pallas(x, w00p, jnp.tile(b00, 4), w01pp,
                                     jnp.tile(b01, 16)),
         y1p),
        ("XLA chain y1p->y0p       ", xla_chain, y1p),
        ("dispconv double (on y0pp)", disp_double, y0pp),
        ("dispconv packed (on y0p) ", disp_packed, y0p),
    ]
    for label, fn, x in cases:
        ms = timeit(loop(fn), (x,), iters) * 1e3
        print(f"{label}: {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
