"""Preprocessing parity (SURVEY §4.3) — where 1e-3 abs-rel dies if ignored."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

import jax.numpy as jnp

from scenedepthestimation_tpu.configs import PreprocessConfig
from scenedepthestimation_tpu.ops.preprocess import (
    normalize,
    preprocess,
    resize_bilinear,
    to_float,
)


def _rand_uint8(shape, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=shape, dtype=np.uint8)


def test_resize_matches_torch_antialias_downscale():
    """jax.image.resize(antialias=True) == torch interpolate(antialias=True)."""
    img = _rand_uint8((1, 96, 320, 3)).astype(np.float32) / 255.0
    out_hw = (64, 128)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), out_hw, antialias=True))
    ref = (
        F.interpolate(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            size=out_hw,
            mode="bilinear",
            align_corners=False,
            antialias=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_resize_matches_torch_upscale():
    img = _rand_uint8((1, 32, 64, 3), seed=1).astype(np.float32) / 255.0
    out_hw = (96, 160)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), out_hw, antialias=True))
    ref = (
        F.interpolate(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            size=out_hw,
            mode="bilinear",
            align_corners=False,
            antialias=True,  # no-op on upscale: filter never widens
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_resize_close_to_pil():
    """PIL BILINEAR is the reference family's loader; pin the gap."""
    img = _rand_uint8((96, 320, 3), seed=2)
    out_hw = (64, 128)
    pil = np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BILINEAR),
        dtype=np.float32,
    ) / 255.0
    ours = np.asarray(
        resize_bilinear(jnp.asarray(img.astype(np.float32) / 255.0), out_hw, True)
    )
    # PIL quantizes to uint8 per pixel (±1/510) and uses fixed-point filter
    # weights; anything below ~2/255 total is loader-equivalent.
    assert np.max(np.abs(ours - pil)) < 2.5 / 255.0


def test_normalize():
    img = np.full((1, 4, 4, 3), 0.5, np.float32)
    out = np.asarray(normalize(jnp.asarray(img), (0.45, 0.45, 0.45), (0.225, 0.225, 0.225)))
    np.testing.assert_allclose(out, (0.5 - 0.45) / 0.225, rtol=1e-6)


def test_to_float_uint8():
    img = np.array([[[[0, 128, 255]]]], dtype=np.uint8)
    out = np.asarray(to_float(jnp.asarray(img)))
    np.testing.assert_allclose(out, [[[[0.0, 128 / 255.0, 1.0]]]], atol=1e-7)


def test_preprocess_full_chain():
    cfg = PreprocessConfig()
    img = _rand_uint8((2, 96, 160, 3), seed=3)
    out = np.asarray(preprocess(jnp.asarray(img), (64, 128), cfg))
    assert out.shape == (2, 64, 128, 3)
    assert out.dtype == np.float32
    # Normalized data should be roughly centered.
    assert abs(out.mean()) < 0.5


def test_preprocess_noop_resize():
    """Same-size input must skip the resize entirely (bit-exact path)."""
    cfg = PreprocessConfig()
    img = _rand_uint8((1, 64, 128, 3), seed=4)
    out = np.asarray(preprocess(jnp.asarray(img), (64, 128), cfg))
    ref = (img.astype(np.float32) / 255.0 - 0.45) / 0.225
    np.testing.assert_allclose(out, ref, atol=1e-6)
