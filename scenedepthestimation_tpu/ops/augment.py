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

from typing import Dict, Optional, Tuple

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


def _jitter_factors(
    key: jax.Array,
    b: int,
    dtype,
    brightness: float,
    contrast: float,
    saturation: float,
    hue: float,
) -> Dict[str, jnp.ndarray]:
    """Draw one set of per-example jitter factors (B, 1, 1, 1)."""
    kb, kc, ks, kh = jax.random.split(key, 4)

    def factors(k, x):
        return jax.random.uniform(
            k, (b, 1, 1, 1), minval=1.0 - x, maxval=1.0 + x
        ).astype(dtype)

    return {
        "brightness": factors(kb, brightness),
        "contrast": factors(kc, contrast),
        "saturation": factors(ks, saturation),
        "hue": jax.random.uniform(
            kh, (b, 1, 1, 1), minval=-hue, maxval=hue
        ).astype(dtype),
    }


def _apply_jitter(img: jnp.ndarray, f: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Apply drawn factors to one view (statistics are the view's own)."""
    out = img * f["brightness"]
    mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * f["contrast"] + mean
    gray = _rgb_to_gray(out)
    out = (out - gray) * f["saturation"] + gray
    h = f["hue"]
    rolled = jnp.roll(out, 1, axis=-1)
    out = out * (1.0 - jnp.abs(h)) + rolled * jnp.abs(h)
    return jnp.clip(out, 0.0, 1.0)


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
    f = _jitter_factors(
        key, img.shape[0], img.dtype, brightness, contrast, saturation, hue
    )
    return _apply_jitter(img, f)


def color_jitter_pair(
    key: jax.Array,
    left: jnp.ndarray,
    right: jnp.ndarray,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.05,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared color jitter for a stereo pair: ONE factor draw applied to
    both views (each view keeps its own mean/gray statistics, the
    torchvision ``Compose``-on-both-views convention) — asymmetric
    photometry between the views would be a spurious matching cue for
    the correlation layer."""
    f = _jitter_factors(
        key, left.shape[0], left.dtype, brightness, contrast, saturation, hue
    )
    return _apply_jitter(left, f), _apply_jitter(right, f)


def random_crop_multi(
    key: jax.Array,
    tensors: Dict[str, jnp.ndarray],
    crop_hw: Tuple[int, int],
) -> Dict[str, jnp.ndarray]:
    """Pair-consistent random crop: ONE (y0, x0) per example applied to
    every tensor (all share leading (B, H, W); trailing dims free).

    Disparity is crop-invariant — both views shift by the same offset,
    so pixel disparity values are unchanged (unlike resize, which would
    rescale them by the width ratio). jit-friendly: static crop size,
    per-example dynamic offsets via vmapped ``lax.dynamic_slice``.
    """
    ch, cw = crop_hw
    first = next(iter(tensors.values()))
    b, h, w = first.shape[:3]
    if (ch, cw) == (h, w):
        return dict(tensors)
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (b,), 0, h - ch + 1)
    x0 = jax.random.randint(kx, (b,), 0, w - cw + 1)

    def crop_one(t, y, x):
        start = (y, x) + (0,) * (t.ndim - 2)
        size = (ch, cw) + t.shape[2:]
        return jax.lax.dynamic_slice(t, start, size)

    return {
        name: jax.vmap(crop_one, in_axes=(0, 0, 0))(t, y0, x0)
        for name, t in tensors.items()
    }


def augment_stereo(
    key: jax.Array,
    batch: Dict[str, jnp.ndarray],
    crop_hw: Optional[Tuple[int, int]] = None,
    hflip_p: float = 0.5,
    jitter_p: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """Pair-consistent stereo train augmentation (SURVEY C2 "train-time
    aug"; VERDICT r2 next-#5). Batch values: 'left'/'right' float [0,1]
    (B,H,W,3); optional 'gt_disp' (B,H,W) px, 'valid' (B,H,W),
    'gt_disp_right'/'valid_right' (right-VIEW GT, if the dataset has it).

    Order: geometric (flip, crop) first — applied to images AND GT —
    then photometric jitter on the network inputs only. The returned
    dict adds 'left_clean'/'right_clean': the post-geometric,
    pre-jitter views, for photometric-loss targets (jittering the
    reconstruction target would corrupt the self-sup objective).

    hflip semantics: a horizontal flip of both views is only a valid
    rectified pair after ALSO swapping them (``random_hflip_pair``), and
    the new left view's GT disparity is the flipped RIGHT-view GT. So
    with 'gt_disp' present but no 'gt_disp_right', the flip is DISABLED
    (label-preserving flips are impossible with left-only GT — the
    standard reason the PSMNet-lineage trains stereo without hflip);
    self-supervised batches (no GT) always flip.
    """
    kf, kc, kj, kp = jax.random.split(key, 4)
    left, right = batch["left"], batch["right"]
    out = dict(batch)

    has_gt = "gt_disp" in batch
    can_flip = (not has_gt) or ("gt_disp_right" in batch)
    if can_flip and hflip_p > 0.0:
        left, right, flipped = random_hflip_pair(kf, left, right, hflip_p)
        if has_gt:
            f3 = flipped[:, None, None]
            out["gt_disp"] = jnp.where(
                f3, batch["gt_disp_right"][:, :, ::-1], batch["gt_disp"]
            )
            if "valid" in batch:
                vr = batch.get("valid_right", batch["valid"])
                out["valid"] = jnp.where(f3, vr[:, :, ::-1], batch["valid"])

    if crop_hw is not None:
        geo = {"left": left, "right": right}
        for k in ("gt_disp", "valid"):
            if k in out:
                geo[k] = out[k]
        geo = random_crop_multi(kc, geo, crop_hw)
        left, right = geo.pop("left"), geo.pop("right")
        out.update(geo)

    out["left_clean"], out["right_clean"] = left, right
    do_jitter = jax.random.bernoulli(kp, jitter_p, (left.shape[0],))
    jl, jr = color_jitter_pair(kj, left, right)
    m = do_jitter[:, None, None, None]
    out["left"] = jnp.where(m, jl, left)
    out["right"] = jnp.where(m, jr, right)
    return out


def augment_temporal(
    key: jax.Array,
    frames: jnp.ndarray,
    k: jnp.ndarray,
    hflip_p: float = 0.5,
    jitter_p: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Triplet-consistent temporal train augmentation (SURVEY C2 ×
    §3.5; VERDICT r4 missing-#3). ``frames`` (B, 3, H, W, 3) float
    [0,1] ordered [prev, target, next]; ``k`` (B, 3, 3) pixel
    intrinsics at this resolution. Returns
    ``(frames_clean, frames_aug, k_new)``:

    * per-example horizontal flip of ALL THREE frames, with the
      principal point mirrored: ``cx' = (W-1) - cx`` on the 0..W-1
      pixel grid of ops/project.pixel_grid. Proof of consistency: with
      F = [[-1,0,W-1],[0,1,0],[0,0,1]] (pixel mirror) and
      M = diag(-1,1,1) (camera-frame mirror), K' = F·K·M has exactly
      this form, so backprojecting a flipped pixel through K'⁻¹ gives
      the mirrored ray M·(K⁻¹p) — the flipped triplet is the same
      rigid scene mirrored, and the mirrored relative pose M₄TM₄
      remains rigid, so the self-supervised objective stays well-posed
      (tests/test_augment.py pins the warp equivariance).
    * ONE shared color-jitter draw applied to all three frames of the
      AUG copy (each frame keeps its own mean/gray statistics — the
      lineage applies the same torchvision jitter instance per frame).
      Per-frame draws would make brightness change a spurious temporal
      cue for PoseNet.

    ``frames_clean`` (flipped, un-jittered) are the photometric-loss
    targets; ``frames_aug`` feed the depth AND pose networks (the
    monodepth2 color/color_aug split).
    """
    kf, kj, kp = jax.random.split(key, 3)
    b, n_frames, _, w, _ = frames.shape

    flip = jax.random.bernoulli(kf, hflip_p, (b,))
    clean = jnp.where(flip[:, None, None, None, None], hflip(frames), frames)
    cx = k[:, 0, 2]
    k_new = k.at[:, 0, 2].set(jnp.where(flip, (w - 1.0) - cx, cx))

    # Shared jitter factors: draw (B,...) once, repeat per frame, apply
    # on the (B*3, H, W, 3) flattening so each frame keeps its own
    # statistics.
    f = _jitter_factors(kj, b, frames.dtype, 0.2, 0.2, 0.2, 0.05)
    f_rep = {kk: jnp.repeat(v, n_frames, axis=0) for kk, v in f.items()}
    flat = clean.reshape(b * n_frames, *clean.shape[2:])
    jittered = _apply_jitter(flat, f_rep).reshape(clean.shape)
    do_jitter = jax.random.bernoulli(kp, jitter_p, (b,))
    aug = jnp.where(
        do_jitter[:, None, None, None, None], jittered, clean
    )
    return clean, aug, k_new


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
