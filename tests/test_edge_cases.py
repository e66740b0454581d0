"""Edge-case hardening tests across ops and the public API."""

import numpy as np
import pytest
import jax.numpy as jnp

from scenedepthestimation_tpu.api import load_weights, predict_stereo
from scenedepthestimation_tpu.configs import RunConfig, StereoConfig


def test_predict_stereo_shape_mismatch_clear_error():
    cfg = RunConfig(
        name="t_edge", pipeline="stereo",
        stereo=StereoConfig(height=32, width=64, max_disp=16, feat_channels=16),
    )
    p = load_weights(None, cfg, seed=0)
    left = np.zeros((32, 64, 3), np.uint8)
    right = np.zeros((32, 96, 3), np.uint8)
    with pytest.raises(ValueError, match="must match"):
        predict_stereo(p, left, right)


def test_soft_argmin_extreme_costs_stable():
    from scenedepthestimation_tpu.ops.soft_argmin import _soft_argmin_jnp

    # Huge magnitudes must not overflow the softmax.
    cost = jnp.asarray(np.array([[[[1e30, -1e30, 0.0, 0.0]]]], np.float32))
    out = np.asarray(_soft_argmin_jnp(cost))
    assert np.isfinite(out).all()
    # argmin of cost is index 1 → disparity ≈ 1
    np.testing.assert_allclose(out[0, 0, 0], 1.0, atol=1e-5)


def test_colormap_constant_input():
    from scenedepthestimation_tpu.utils.colormap import colormap_magma

    out = colormap_magma(np.full((4, 4), 3.14, np.float32))
    assert out.shape == (4, 4, 3) and out.dtype == np.uint8


def test_disp_to_depth_bounds():
    from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth

    disp = jnp.asarray([0.0, 1.0], jnp.float32)
    _, depth = disp_to_depth(disp, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(depth), [100.0, 0.1], rtol=1e-6)


def test_torch_import_rejects_unknown_param():
    from scenedepthestimation_tpu.utils.torch_import import convert_state_dict

    with pytest.raises(ValueError, match="unhandled torch parameter"):
        convert_state_dict({"layer.mystery_blob": np.zeros((3,))})


def test_preprocess_bf16_output_dtype():
    from scenedepthestimation_tpu.ops.preprocess import preprocess

    img = np.zeros((1, 32, 64, 3), np.uint8)
    out = preprocess(jnp.asarray(img), (16, 32), compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (1, 16, 32, 3)


def test_eigen_crop_tiny_image():
    from scenedepthestimation_tpu.utils.metrics import eigen_crop_mask

    mask = np.asarray(eigen_crop_mask(4, 4))
    assert mask.shape == (4, 4)
    assert mask.any()  # crop never empties the mask entirely


def test_correlation_rejects_shape_mismatch():
    from scenedepthestimation_tpu.ops.correlation import correlation1d

    with pytest.raises(ValueError, match="shape mismatch"):
        correlation1d(jnp.zeros((1, 4, 8, 3)), jnp.zeros((1, 4, 9, 3)), 4)
