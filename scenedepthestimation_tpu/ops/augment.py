"""Train-time augmentations (SURVEY C2: "train-time aug (flip, color
jitter)") as jit-able, RNG-keyed device functions — augmentation runs
inside the train step like the rest of preprocessing, not on the host.

Conventions of the monodepth2 lineage (UNVERIFIED vs reference):
* horizontal flip with p=0.5 — for stereo pairs a flip must ALSO swap
  left/right views (a flipped left camera becomes the right camera);
* color jitter (brightness/contrast/saturation/hue-lite) applied to the
  network INPUT only, never to the photometric-loss target frames.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def hflip(img: jnp.ndarray) -> jnp.ndarray:
    """Flip (..., H, W, C) along W."""
    return img[..., :, ::-1, :]


def random_hflip(
    key: jax.Array, img: jnp.ndarray, p: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-example random flip of (B, H, W, C). Returns (img, flipped?)."""
    flip = jax.random.bernoulli(key, p, (img.shape[0],))
    out = jnp.where(flip[:, None, None, None], hflip(img), img)
    return out, flip


def random_hflip_pair(
    key: jax.Array, left: jnp.ndarray, right: jnp.ndarray, p: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stereo-consistent flip: flipped samples swap AND mirror the views
    (disparity sign/geometry stays valid)."""
    flip = jax.random.bernoulli(key, p, (left.shape[0],))
    f = flip[:, None, None, None]
    new_left = jnp.where(f, hflip(right), left)
    new_right = jnp.where(f, hflip(left), right)
    return new_left, new_right, flip


def _rgb_to_gray(img: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def color_jitter(
    key: jax.Array,
    img: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.05,
) -> jnp.ndarray:
    """Per-example color jitter of float images in [0, 1] (B, H, W, 3).

    brightness/contrast/saturation are multiplicative factors drawn from
    [1-x, 1+x]; hue is a cheap channel-rotation mix of strength ±hue
    (the lineage's torchvision jitter is perceptual-hue; at |hue|≤0.05
    the channel-mix approximation is visually equivalent and stays a
    pure matmul — UNVERIFIED vs reference).
    """
    b = img.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)

    def factors(k, x):
        return jax.random.uniform(
            k, (b, 1, 1, 1), minval=1.0 - x, maxval=1.0 + x
        ).astype(img.dtype)

    out = img * factors(kb, brightness)
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * factors(kc, contrast) + mean
    gray = _rgb_to_gray(out)
    out = (out - gray) * factors(ks, saturation) + gray
    h = jax.random.uniform(kh, (b, 1, 1, 1), minval=-hue, maxval=hue).astype(
        img.dtype
    )
    rolled = jnp.roll(out, 1, axis=-1)
    out = out * (1.0 - jnp.abs(h)) + rolled * jnp.abs(h)
    return jnp.clip(out, 0.0, 1.0)


def augment_mono(
    key: jax.Array, batch: Dict[str, jnp.ndarray], jitter_p: float = 1.0
) -> Dict[str, jnp.ndarray]:
    """Flip image+GT consistently; jitter the image. Batch values:
    'image' float [0,1] (B,H,W,3), optional 'gt_disp' (B,H,W,1)."""
    kf, kj, kp = jax.random.split(key, 3)
    img, flipped = random_hflip(kf, batch["image"])
    out = dict(batch)
    if "gt_disp" in batch:
        out["gt_disp"] = jnp.where(
            flipped[:, None, None, None], hflip(batch["gt_disp"]), batch["gt_disp"]
        )
    do_jitter = jax.random.bernoulli(kp, jitter_p, (img.shape[0],))
    jittered = color_jitter(kj, img)
    out["image"] = jnp.where(do_jitter[:, None, None, None], jittered, img)
    return out
