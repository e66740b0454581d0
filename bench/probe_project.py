"""Where does the temporal-selfsup step's 311 ms go? The 2-D reproject
bilinear sample (ops/project.bilinear_sample) does 4 take_along_axis
gathers over a flattened (B, H*W, C=3) — probe the gather-form
alternatives on the real chip:

  cur        4x take_along_axis over (B, HW, 3)        [today]
  pack4      corner-packed table -> ONE gather (B,HW,12)
  flatlane   (B, 3, HW) layout, gather along minor axis
  rowlane    per-row gather along W (minor) — the primitive the banded
             variant needs: (B, H, C, W) idx varies per (b,h,w)
  banded     exact-within-band: scan over dy in [-K, K+1], per-dy
             edge-clamped row slice + lane gather along W, masked
             accumulate of the 4 bilinear corners. O((2K+2) * img)
             VPU/memory, NO flat gather.

Usage: python -u bench/probe_project.py [batch] [iters] [K]
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

from scenedepthestimation_tpu.ops.project import bilinear_sample


def timeit(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, 2))
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, iters))
        best.append((time.perf_counter() - t0) / iters)
    return sorted(best)[1]


def loop(fn):
    @jax.jit
    def t(img, coords, n):
        def body(i, acc):
            y = fn(img, coords + i * 1e-6)
            return acc + jnp.float32(y.mean() if hasattr(y, "mean") else y)

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    return t


def corners(coords, h, w):
    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    return (
        x0.astype(jnp.int32),
        y0.astype(jnp.int32),
        (x - x0)[..., None],
        (y - y0)[..., None],
    )


def sample_pack4(img, coords):
    """One gather of a 4-corner-packed (B, HW, 4C) table at idx00."""
    b, h, w, c = img.shape
    ix0, iy0, fx, fy = corners(coords, h, w)
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    table = jnp.concatenate([img, right, down, downright], axis=-1)
    flat = table.reshape(b, h * w, 4 * c)
    idx = (iy0 * w + ix0).reshape(b, -1, 1)
    g = jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, 4 * c)
    c00, c01, c10, c11 = g[..., :c], g[..., c : 2 * c], g[..., 2 * c : 3 * c], g[..., 3 * c :]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def sample_flatlane(img, coords):
    """(B, C, HW) layout, gather along the minor axis."""
    b, h, w, c = img.shape
    ix0, iy0, fx, fy = corners(coords, h, w)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)
    flat = img.transpose(0, 3, 1, 2).reshape(b, c, h * w)

    def g(iy, ix):
        idx = (iy * w + ix).reshape(b, 1, h * w)
        idx = jnp.broadcast_to(idx, (b, c, h * w))
        out = jnp.take_along_axis(flat, idx, axis=-1)
        return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)

    top = g(iy0, ix0) * (1 - fx) + g(iy0, ix1) * fx
    bot = g(iy1, ix0) * (1 - fx) + g(iy1, ix1) * fx
    return top * (1 - fy) + bot * fy


def rowlane_once(img, coords):
    """The banded variant's primitive: ONE per-row gather along W
    (minor axis), NHWC->NHCW layout, idx per (b,h,w)."""
    b, h, w, c = img.shape
    ix0, _, _, _ = corners(coords, h, w)
    t = img.transpose(0, 1, 3, 2)  # (B, H, C, W)
    idx = jnp.broadcast_to(ix0[:, :, None, :], (b, h, c, w))
    out = jnp.take_along_axis(t, idx, axis=-1)
    return out.transpose(0, 1, 3, 2)


def rowlane_nhwc_once(img, coords):
    """Same gather but along axis=2 of NHWC (non-minor)."""
    b, h, w, c = img.shape
    ix0, _, _, _ = corners(coords, h, w)
    idx = jnp.broadcast_to(ix0[..., None], (b, h, w, c))
    return jnp.take_along_axis(img, idx, axis=2)


def make_banded(k_band: int):
    def sample_banded(img, coords):
        b, h, w, c = img.shape
        ix0, iy0, fx, fy = corners(coords, h, w)
        # Band-clamp the source row (exact when |iy0 - h| <= K).
        rows = jnp.arange(h, dtype=jnp.int32)[None, :, None]
        iy0 = jnp.clip(iy0, rows - k_band, rows + k_band)
        iy0 = jnp.clip(iy0, 0, h - 1)
        dy0 = iy0 - rows  # in [-K, K]

        # Column pair (x0, x1=x0+1 edge-clamped) packed into channels,
        # W moved minor for the lane gather: (B, H, 2C, W).
        right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        pair = jnp.concatenate([img, right], axis=-1).transpose(0, 1, 3, 2)
        # Edge-replicate K rows above, K+1 below: (B, H+2K+1, 2C, W).
        pad = jnp.concatenate(
            [jnp.repeat(pair[:, :1], k_band, axis=1), pair,
             jnp.repeat(pair[:, -1:], k_band + 1, axis=1)],
            axis=1,
        )
        idx = jnp.broadcast_to(ix0[:, :, None, :], (b, h, 2 * c, w))
        wx = jnp.concatenate([1.0 - fx, fx], axis=-1)  # (B, H, W, 2)
        wx = jnp.repeat(wx, c, axis=-1)  # matches (c00.., c01..) packing? no:
        # pair packs [img(C), right(C)] so weights are [1-fx]*C ++ [fx]*C
        wx = jnp.concatenate(
            [jnp.broadcast_to(1.0 - fx, (b, h, w, c)),
             jnp.broadcast_to(fx, (b, h, w, c))], axis=-1,
        )

        def step(carry, dy):
            acc0, acc1 = carry
            sl = lax.dynamic_slice_in_dim(pad, k_band + dy, h, axis=1)
            g = jnp.take_along_axis(sl, idx, axis=-1)  # (B,H,2C,W)
            g = g.transpose(0, 1, 3, 2)  # (B,H,W,2C)
            gx = (g * wx)[..., :c] + (g * wx)[..., c:]  # x-interp (B,H,W,C)
            m0 = (dy0 == dy).astype(img.dtype)[..., None]
            m1 = (dy0 == dy - 1).astype(img.dtype)[..., None]
            return (acc0 + m0 * gx, acc1 + m1 * gx), None

        z = jnp.zeros((b, h, w, c), img.dtype)
        (top, bot), _ = lax.scan(
            step, (z, z), jnp.arange(-k_band, k_band + 2, dtype=jnp.int32)
        )
        return top * (1 - fy) + bot * fy

    return sample_banded


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    h, w = 192, 640
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (b, h, w, 3), jnp.float32)
    kx, ky = jax.random.split(key)
    # Flow: x up to +-60 px, y up to +-K*0.8 (in-band)
    cx = jnp.arange(w, dtype=jnp.float32)[None, None, :] + (
        jax.random.uniform(kx, (b, h, w)) - 0.5
    ) * 120.0
    cy = jnp.arange(h, dtype=jnp.float32)[None, :, None] + (
        jax.random.uniform(ky, (b, h, w)) - 0.5
    ) * (k * 1.6)
    coords = jnp.stack([cx, cy], axis=-1)
    jax.block_until_ready(img)

    ref = np.asarray(bilinear_sample(img[:2], coords[:2])[0])
    for name, fn in [
        ("pack4 ", sample_pack4),
        ("flatlane", sample_flatlane),
        (f"banded{k}", make_banded(k)),
    ]:
        got = np.asarray(fn(img[:2], coords[:2]))
        print(f"{name} max|diff|: {float(np.abs(got - ref).max()):.2e}", flush=True)

    cands = [
        ("cur 4xflat  ", lambda i_, c_: bilinear_sample(i_, c_)[0]),
        ("pack4       ", sample_pack4),
        ("flatlane    ", sample_flatlane),
        ("rowlane x1  ", rowlane_once),
        ("rowlaneNHWC ", rowlane_nhwc_once),
        (f"banded K={k} ", make_banded(k)),
    ]
    for name, fn in cands:
        ms = timeit(loop(lambda i_, c_: fn(i_, c_).mean()), (img, coords), iters) * 1e3
        print(f"{name}: {ms:8.2f} ms fwd (b{b}, {h}x{w})", flush=True)


if __name__ == "__main__":
    main()
