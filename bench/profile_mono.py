"""Stage-level timing of the judged mono bench (384x1152 bf16 b128).

Times each pipeline stage with the same fori_loop harness as bench.py
(defeats the ~28 ms dispatch tunnel) so the decoder-repack work
(ROADMAP #1 / VERDICT r2 #2) optimizes against measured numbers, not the
round-1 profile's b8 trace.

Usage: python bench/profile_mono.py [batch]
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

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import build_mono_program, load_weights
from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.models.unet_decoder import DepthDecoder
from scenedepthestimation_tpu.ops.preprocess import preprocess


def timeit(fn, args, iters=16, warmup=2):
    """Median-of-3 wall time of ``iters`` on-device loop iterations."""
    for _ in range(warmup):
        float(fn(*args, warmup))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = configs.get("mono_kitti_384x1152_bench")
    import dataclasses

    cfg = dataclasses.replace(cfg, batch_size=b)
    h, w = cfg.mono.height, cfg.mono.width
    dtype = jnp.bfloat16
    predictor = load_weights(None, cfg, seed=0)
    variables = predictor.variables

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))

    # --- full program ------------------------------------------------
    program = build_mono_program(cfg, predictor.model)

    @jax.jit
    def t_full(variables, img, n):
        def body(i, acc):
            return acc + program(variables, img + i.astype(jnp.uint8))["depth"].mean()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    full = timeit(t_full, (variables, img))
    print(f"full program      : {full * 1e3:8.2f} ms/iter  {b / full:8.1f} fps")

    # --- preprocess only ----------------------------------------------
    @jax.jit
    def t_pre(img, n):
        def body(i, acc):
            x = preprocess(img + i.astype(jnp.uint8), (h, w), cfg.pre, compute_dtype=dtype)
            return acc + x.mean().astype(jnp.float32)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    pre = timeit(t_pre, (img,))
    print(f"preprocess        : {pre * 1e3:8.2f} ms/iter")

    # --- encoder only ---------------------------------------------------
    enc = ResNetEncoder(num_layers=18, dtype=dtype)
    x0 = preprocess(img, (h, w), cfg.pre, compute_dtype=dtype)
    enc_vars = jax.tree.map(
        lambda a: a, {"params": variables["params"]["encoder"],
                      "batch_stats": variables["batch_stats"]["encoder"]}
    )

    # keep each iteration live: perturb input by i (cheap add)
    @jax.jit
    def t_enc2(enc_vars, x, n):
        def body(i, acc):
            feats = enc.apply(enc_vars, x + i.astype(dtype))
            s = sum(f.mean().astype(jnp.float32) for f in feats)
            return acc + s

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    enc_t = timeit(t_enc2, (enc_vars, x0))
    print(f"encoder           : {enc_t * 1e3:8.2f} ms/iter")

    # --- decoder (truncated at each level) -------------------------------
    feats = enc.apply(enc_vars, x0)
    feats = [jnp.asarray(f) for f in feats]

    # Build truncated decoders as fresh modules (fresh params are fine for
    # timing; arithmetic is weight-independent).
    from flax import linen as nn
    from scenedepthestimation_tpu.models.unet_decoder import ConvBlock, DispHead
    from scenedepthestimation_tpu.ops.upsample import upsample2x, upsample_concat

    def make_trunc(stop_i, with_heads):
        class Trunc(nn.Module):
            @nn.compact
            def __call__(self, features):
                outs = []
                x = features[-1]
                for i in range(4, stop_i - 1, -1):
                    x = ConvBlock(cfg.mono.dec_channels[i], dtype=dtype, name=f"upconv_{i}_0")(x)
                    if i > 0:
                        x = upsample_concat(x, features[i - 1], mode=cfg.mono.upsample_mode)
                    else:
                        x = upsample2x(x, mode=cfg.mono.upsample_mode)
                    x = ConvBlock(cfg.mono.dec_channels[i], dtype=dtype, name=f"upconv_{i}_1")(x)
                    if with_heads and i in (0, 1, 2, 3):
                        outs.append(DispHead(dtype=dtype, name=f"dispconv_{i}")(x))
                return outs, x

        return Trunc()

    for stop_i, label in ((2, "levels 4..2"), (1, "levels 4..1"), (0, "levels 4..0")):
        for with_heads in (False, True):
            mod = make_trunc(stop_i, with_heads)
            tvars = mod.init(jax.random.PRNGKey(0), feats)

            @jax.jit
            def t_dec(tvars, feats, n, mod=mod):
                def body(i, acc):
                    f = [feats[0] + i.astype(dtype)] + list(feats[1:])
                    outs, x = mod.apply(tvars, f)
                    s = x.mean().astype(jnp.float32)
                    for o in outs:
                        s = s + o.mean()
                    return acc + s

                return lax.fori_loop(0, n, body, jnp.float32(0.0))

            dt = timeit(t_dec, (tvars, feats))
            print(
                f"decoder {label}{' +heads' if with_heads else '       '}: "
                f"{dt * 1e3:8.2f} ms/iter"
            )


if __name__ == "__main__":
    main()
