"""On-chip timing of the decoder-tail variants (b128 bf16 384x1152 by
default — the judged config's shape).

Measures, from the level-2 output x (B, H/4, W/4, 64) + skip features[0]
(B, H/2, W/2, 64) down to the (B, H, W, 1) fp32 disparity:

  A. standard tail (what DepthDecoder runs today)      — round-1: ~50 ms
  B. collapsed tail, dispconv packed at H/2
  C. collapsed tail, dispconv at full res (d2s first)

plus per-op timings of the pieces (collapsed u01, packed dispconv,
full-res dispconv, d2s) so the next kernel decision is evidence-based.

Usage: python -u bench/profile_collapsed.py [batch] [iters]
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.configs import MonoConfig
from scenedepthestimation_tpu.ops import collapsed, packed
from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla
from scenedepthestimation_tpu.ops.upsample import upsample_concat, upsample2x


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
    """fori_loop harness with an input perturbation so XLA cannot hoist
    the body (same trick as benchmark.run_bench)."""

    @jax.jit
    def t(x, f0, n):
        def body(i, acc):
            y = fn(x + i.astype(x.dtype) * 1e-6, f0)
            return acc + y.mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    h, w = 384, 1152
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    cfg = MonoConfig(height=h, width=w)

    # Real decoder params (so shapes/dtypes match production). Param
    # shapes are resolution-independent — init small to keep the one-off
    # compile cheap.
    model = MonoDepthNet(cfg=MonoConfig(height=64, width=128))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3), jnp.float32)
    )
    dp = jax.tree.map(lambda a: a.astype(dtype), variables["params"]["decoder"])

    def P(name):
        q = dp[name]["conv"]
        return q["kernel"], q["bias"]

    x = jnp.asarray(
        rng.standard_normal((b, h // 4, w // 4, 64), dtype=np.float32)
    ).astype(dtype)
    f0 = jnp.asarray(
        rng.standard_normal((b, h // 2, w // 2, 64), dtype=np.float32)
    ).astype(dtype)
    jax.block_until_ready((x, f0))
    print(f"inputs staged (b={b})", flush=True)

    def tail_standard(x, f0):
        t = conv3x3_xla(x, *P("upconv_1_0"), "elu")
        y = upsample_concat(t, f0, mode="nearest")
        y = conv3x3_xla(y, *P("upconv_1_1"), "elu")
        z = conv3x3_xla(y, *P("upconv_0_0"), "elu")
        z = upsample2x(z, mode="nearest")
        y0 = conv3x3_xla(z, *P("upconv_0_1"), "elu")
        d = conv3x3_xla(y0, *P("dispconv_0"), "none")
        return jax.nn.sigmoid(d.astype(jnp.float32))

    def tail_collapsed(disp_variant):
        def run(x, f0):
            feats = [f0, None, None, None, None]

            # inline collapsed tail from level-1 (skip levels 4..2)
            t = conv3x3_xla(x, *P("upconv_1_0"), "elu")
            k11, b11 = P("upconv_1_1")
            c1 = 32
            y1p = collapsed.conv3x3_edge(
                t, collapsed.collapse_upsample_conv_kernel(k11[:, :, :c1, :])
            )
            y1p = y1p + collapsed.conv3x3_edge(
                packed.space_to_depth(f0), packed.pack_conv3x3_kernel(k11[:, :, c1:, :])
            )
            y1p = jax.nn.elu(y1p + jnp.tile(b11, 4))
            k00, b00 = P("upconv_0_0")
            zp = jax.nn.elu(
                collapsed.conv3x3_edge(y1p, packed.pack_conv3x3_kernel(k00))
                + jnp.tile(b00, 4)
            )
            z = packed.depth_to_space(zp)
            k01, b01 = P("upconv_0_1")
            y0p = jax.nn.elu(
                collapsed.conv3x3_edge(
                    z, collapsed.collapse_upsample_conv_kernel(k01)
                )
                + jnp.tile(b01, 4)
            )
            kd, bd = P("dispconv_0")
            if disp_variant == "fullres":
                y0 = packed.depth_to_space(y0p)
                d = conv3x3_xla(y0, kd, bd, "none")
                return jax.nn.sigmoid(d.astype(jnp.float32))
            dpk = collapsed.conv3x3_edge(y0p, packed.pack_conv3x3_kernel(kd))
            dpk = jax.nn.sigmoid((dpk + jnp.tile(bd, 4)).astype(jnp.float32))
            return packed.depth_to_space(dpk)

        return run

    for label, fn in (
        ("A standard tail      ", tail_standard),
        ("B collapsed+packed-dc", tail_collapsed("packed")),
        ("C collapsed+fullres-dc", tail_collapsed("fullres")),
    ):
        ms = timeit(loop(fn), (x, f0), iters) * 1e3
        print(f"{label}: {ms:8.2f} ms/iter  ({b / (ms/1e3):7.1f} fps)", flush=True)

    # ---- per-op timings ------------------------------------------------
    z = jnp.asarray(
        rng.standard_normal((b, h // 2, w // 2, 16), dtype=np.float32)
    ).astype(dtype)
    y0p = f0  # same shape/dtype as the packed u01 output
    k01, b01 = P("upconv_0_1")
    kd, bd = P("dispconv_0")
    kp01 = collapsed.collapse_upsample_conv_kernel(k01)
    kpd = packed.pack_conv3x3_kernel(kd)

    ops = [
        ("u01 collapsed (H/2, 16->64)",
         lambda z, _: jax.nn.elu(collapsed.conv3x3_edge(z, kp01) + jnp.tile(b01, 4))),
        ("dispconv packed (H/2, 64->4)",
         lambda _, y: jax.nn.sigmoid(
             (collapsed.conv3x3_edge(y, kpd) + jnp.tile(bd, 4)).astype(jnp.float32))),
        ("d2s y0p (H/2,64)->(H,16)", lambda _, y: packed.depth_to_space(y)),
        ("dispconv fullres (H, 16->1)",
         lambda _, y: jax.nn.sigmoid(
             conv3x3_xla(packed.depth_to_space(y), kd, bd, "none").astype(jnp.float32))),
        ("u01 standard (H, 16->16)",
         lambda z, _: conv3x3_xla(upsample2x(z, mode="nearest"), k01, b01, "elu")),
    ]
    for label, fn in ops:
        ms = timeit(loop(fn), (z, y0p), iters) * 1e3
        print(f"{label:32s}: {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
