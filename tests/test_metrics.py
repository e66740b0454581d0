"""Metric kernels vs hand-computed values (SURVEY §4.5)."""

import numpy as np
import jax.numpy as jnp

from scenedepthestimation_tpu.configs import EvalConfig
from scenedepthestimation_tpu.utils.metrics import (
    depth_errors,
    disparity_errors,
    eigen_crop_mask,
    evaluate_depth_image,
)


def test_depth_errors_hand_computed():
    gt = jnp.asarray(np.array([[1.0, 2.0, 4.0]], np.float32))
    pred = jnp.asarray(np.array([[1.0, 1.0, 5.0]], np.float32))
    mask = jnp.ones_like(gt, dtype=bool)
    m = {k: float(v) for k, v in depth_errors(gt, pred, mask).items()}
    # abs_rel = mean(|g-p|/g) = (0 + 0.5 + 0.25) / 3
    np.testing.assert_allclose(m["abs_rel"], 0.25, rtol=1e-6)
    # sq_rel = (0 + 1/2 + 1/4) / 3
    np.testing.assert_allclose(m["sq_rel"], 0.25, rtol=1e-6)
    # rmse = sqrt((0 + 1 + 1)/3)
    np.testing.assert_allclose(m["rmse"], np.sqrt(2.0 / 3.0), rtol=1e-6)
    # thresholds: ratios are 1, 2, 1.25 → a1 = 1/3 (strict <);
    # a2 (<1.5625) and a3 (<1.9531) both still exclude the ratio-2 pixel.
    np.testing.assert_allclose(m["a1"], 1.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(m["a2"], 2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(m["a3"], 2.0 / 3.0, rtol=1e-6)


def test_depth_errors_respects_mask():
    gt = jnp.asarray(np.array([[1.0, 0.0], [2.0, 100.0]], np.float32))
    pred = jnp.asarray(np.array([[2.0, 50.0], [2.0, 1.0]], np.float32))
    mask = jnp.asarray(np.array([[True, False], [True, False]]))
    m = depth_errors(gt, pred, mask)
    np.testing.assert_allclose(float(m["abs_rel"]), (1.0 + 0.0) / 2, rtol=1e-6)


def test_eigen_crop_mask_golden():
    mask = np.asarray(eigen_crop_mask(100, 100))
    rows = np.where(mask.any(axis=1))[0]
    cols = np.where(mask.any(axis=0))[0]
    # floor(0.40810811*100)=40 .. floor(0.99189189*100)=99 (exclusive)
    assert rows[0] == 40 and rows[-1] == 98
    assert cols[0] == 3 and cols[-1] == 95


def test_median_scaling():
    gt = np.full((10, 10), 4.0, np.float32)
    pred = np.full((10, 10), 2.0, np.float32)
    out = evaluate_depth_image(
        jnp.asarray(pred),
        jnp.asarray(gt),
        EvalConfig(median_scaling=True),
        apply_eigen_crop=False,
    )
    np.testing.assert_allclose(float(out["scale_ratio"]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(out["abs_rel"]), 0.0, atol=1e-7)


def test_no_median_scaling():
    gt = np.full((10, 10), 4.0, np.float32)
    pred = np.full((10, 10), 2.0, np.float32)
    out = evaluate_depth_image(
        jnp.asarray(pred),
        jnp.asarray(gt),
        EvalConfig(median_scaling=False),
        apply_eigen_crop=False,
    )
    np.testing.assert_allclose(float(out["abs_rel"]), 0.5, rtol=1e-6)


def test_masked_median_even_count():
    from scenedepthestimation_tpu.utils.metrics import _masked_median

    x = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0, 100.0], np.float32))
    mask = jnp.asarray(np.array([True, True, True, True, False]))
    np.testing.assert_allclose(float(_masked_median(x, mask)), 2.5, rtol=1e-6)


def test_disparity_errors_epe_d1():
    gt = jnp.asarray(np.array([[10.0, 50.0, 100.0, 2.0]], np.float32))
    pred = jnp.asarray(np.array([[10.0, 54.0, 108.0, 6.0]], np.float32))
    valid = jnp.ones_like(gt, dtype=bool)
    m = disparity_errors(pred, gt, valid)
    np.testing.assert_allclose(float(m["epe"]), (0 + 4 + 8 + 4) / 4, rtol=1e-6)
    # D1: err>3 AND err>5%GT → px2: 4>3, 4>2.5 ✓; px3: 8>3, 8>5 ✓;
    # px4: 4>3 but 4>0.1 ✓ → 3/4 bad
    np.testing.assert_allclose(float(m["d1_all"]), 0.75, rtol=1e-6)
