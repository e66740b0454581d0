"""In-program decoder timing at the judged config (b128 bf16 384x1152):
times the decoder FROM THE REAL ENCODER FEATURES with production param
trees, standard vs collapsed — the isolated-harness numbers
(profile_collapsed.py) exaggerate the standard tail, and the e2e bench
only moves a fraction of the isolated delta; this pins where the
difference lives.

Usage: python -u bench/profile_inprog.py [batch] [iters]
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import load_weights
from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.models.unet_decoder import DepthDecoder
from scenedepthestimation_tpu.ops.collapsed import collapsed_mono_decoder
from scenedepthestimation_tpu.ops.preprocess import preprocess


def timeit(fn, args, iters=8, warmup=2):
    for _ in range(warmup):
        float(fn(*args, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = dataclasses.replace(configs.get("mono_kitti_384x1152_bench"), batch_size=b)
    h, w = cfg.mono.height, cfg.mono.width
    dtype = jnp.bfloat16
    predictor = load_weights(None, cfg, seed=0)
    variables = predictor.variables
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    dec_params = variables["params"]["decoder"]
    enc = ResNetEncoder(num_layers=cfg.mono.num_layers, dtype=dtype)
    dec = DepthDecoder(
        dec_channels=cfg.mono.dec_channels,
        scales=cfg.mono.scales,
        upsample_mode=cfg.mono.upsample_mode,
        dtype=dtype,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    x0 = jax.jit(lambda im: preprocess(im, (h, w), cfg.pre, compute_dtype=dtype))(img)
    feats = jax.jit(lambda v, x: enc.apply(v, x))(enc_vars, x0)
    feats = jax.block_until_ready(list(feats))
    print("feats staged", flush=True)

    def loop(fn):
        @jax.jit
        def t(feats, n):
            def body(i, acc):
                f = [feats[0] + (i.astype(jnp.float32) * 1e-6).astype(dtype)] + list(feats[1:])
                return acc + fn(f).mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        return t

    def dec_std(f):
        return dec.apply({"params": dec_params}, f)[0].astype(jnp.float32)

    def dec_col(f):
        return collapsed_mono_decoder(
            dec_params,
            f,
            dec_channels=cfg.mono.dec_channels,
            upsample_mode=cfg.mono.upsample_mode,
            dtype=dtype,
        )

    for label, fn in (
        ("decoder standard (4 scales)", dec_std),
        ("decoder collapsed (scale 0)", dec_col),
    ):
        ms = timeit(loop(fn), (feats,), iters) * 1e3
        print(f"{label}: {ms:8.2f} ms/iter", flush=True)

    # encoder+decoder combined (the layout boundary is inside the jit).
    def loop2(fn):
        @jax.jit
        def t(x0, n):
            def body(i, acc):
                f = enc.apply(enc_vars, x0 + (i.astype(jnp.float32) * 1e-6).astype(dtype))
                return acc + fn(list(f)).mean().astype(jnp.float32)

            return lax.fori_loop(0, n, body, jnp.float32(0.0))

        return t

    for label, fn in (
        ("enc+dec standard", dec_std),
        ("enc+dec collapsed", dec_col),
    ):
        ms = timeit(loop2(fn), (x0,), iters) * 1e3
        print(f"{label}: {ms:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
