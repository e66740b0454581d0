"""Disparity-based horizontal image warping (view synthesis for
self-supervised photometric training — SURVEY C14's "photometric" half).

``warp_horizontal(right, disp)`` samples the right view at
``x - disp(x)`` to reconstruct the left view. Rectified stereo means the
sample is 1-D along W. Two implementations:

* **gather** — ``jnp.take_along_axis`` of the two neighbouring columns
  + lerp. Fine on CPU; on TPU the W-axis gather is catastrophic:
  measured **216 ms** forward at (16, 192, 640, 3) fp32
  (bench/probe_warp.py) — it was ~75% of the mono-selfsup train step.
* **one-hot matmul** (TPU default) — gathers do not exist on the MXU,
  but a gather IS a matmul with a one-hot matrix:
  ``recon[.., w, c] = sum_w' M[.., w, w'] pair[.., w', c]``. Measured
  **8.3 ms** forward / 17.5 ms with the disp gradient at the same
  shape (26x). Exactness: only the BINARY floor-sample matrix is built
  (0/1 entries are exact in every dtype); the ceil sample comes from
  warping the edge-clamped column-shifted image with the SAME matrix
  (i1 = min(i0+1, W-1) — the shift commutes with the sample), and the
  fractional lerp stays elementwise. The backward needs no scatter:
  d/d(disp) flows through the lerp weight, d/d(img) through the
  transposed matmul.

The one-hot matrix is (B, H, W, W) — ``_ROW_CHUNK_BYTES`` bounds its
materialization by mapping over row chunks at large shapes.

Gradients flow into ``disp`` in both forms; callers warp DATA frames,
so wrap the image in ``lax.stop_gradient`` if its (matmul) cotangent
is not needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# None = auto (one-hot on TPU, gather elsewhere); bool = forced.
_USE_ONEHOT: bool | None = None

# Cap on the materialized one-hot matrix per map step (fp32 bytes).
_ROW_CHUNK_BYTES = 1 << 31  # 2 GiB


def set_use_onehot(flag: bool | None) -> None:
    global _USE_ONEHOT
    _USE_ONEHOT = flag


def _src_coords(disp: jnp.ndarray, w: int):
    x = jnp.arange(w, dtype=disp.dtype)[None, None, :]  # (1, 1, W)
    src = jnp.clip(x - disp, 0.0, w - 1.0)
    x0 = jnp.floor(src)
    return x0.astype(jnp.int32), src - x0


def _warp_gather(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = img.shape
    i0, frac = _src_coords(disp, w)
    frac = frac[..., None]
    i1 = jnp.minimum(i0 + 1, w - 1)
    left = jnp.take_along_axis(
        img, jnp.broadcast_to(i0[..., None], (b, h, w, c)), axis=2
    )
    right = jnp.take_along_axis(
        img, jnp.broadcast_to(i1[..., None], (b, h, w, c)), axis=2
    )
    return left * (1.0 - frac) + right * frac


def _warp_onehot(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = img.shape
    i0, frac = _src_coords(disp, w)
    # Edge-clamped column shift: pair[.., w', C:] = img[.., min(w'+1, W-1)]
    # — sampling it at i0 IS the i1 = min(i0+1, W-1) sample.
    shifted = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    pair = jnp.concatenate([img, shifted], axis=-1)  # (B, H, W, 2C)

    cols = jnp.arange(w, dtype=jnp.int32)[None, None, None, :]

    def chunk(args):
        i0c, pairc = args
        m = lax.stop_gradient(
            (cols == i0c[..., None]).astype(pairc.dtype)
        )  # (B, hc, W, W') binary — exact in any dtype
        return jnp.einsum(
            "bhwk,bhkc->bhwc",
            m,
            pairc,
            precision=lax.Precision.HIGHEST,
        )

    rows_per_chunk = max(
        1, _ROW_CHUNK_BYTES // (b * w * w * jnp.dtype(img.dtype).itemsize)
    )
    if rows_per_chunk >= h:
        s = chunk((i0, pair))
    else:
        hc = next(x for x in range(rows_per_chunk, 0, -1) if h % x == 0)
        i0r = i0.reshape(b, h // hc, hc, w).transpose(1, 0, 2, 3)
        pairr = pair.reshape(b, h // hc, hc, w, 2 * c).transpose(1, 0, 2, 3, 4)
        s = lax.map(chunk, (i0r, pairr))  # (H/hc, B, hc, W, 2C)
        s = s.transpose(1, 0, 2, 3, 4).reshape(b, h, w, 2 * c)
    left, right = s[..., :c], s[..., c:]
    return left + frac[..., None] * (right - left)


def warp_horizontal(img: jnp.ndarray, disp: jnp.ndarray) -> jnp.ndarray:
    """img (B, H, W, C), disp (B, H, W) in px (positive = sample left).

    Returns img sampled at x' = x - disp, bilinear along W, edge-clamped.
    Out-of-frame samples clamp to the border column (mask with
    ``valid_mask_horizontal`` when training).
    """
    use_onehot = _USE_ONEHOT
    if use_onehot is None:
        use_onehot = jax.default_backend() == "tpu"
    return _warp_onehot(img, disp) if use_onehot else _warp_gather(img, disp)


def valid_mask_horizontal(disp: jnp.ndarray, width: int) -> jnp.ndarray:
    """True where x - disp lands inside the frame."""
    x = jnp.arange(width, dtype=disp.dtype)[None, None, :]
    src = x - disp
    return (src >= 0.0) & (src <= width - 1.0)
