"""Disparity-classification auxiliary loss (losses.
disparity_classification_loss) — the structural anchor against the
soft-argmin uniform-softmax collapse (BASELINE.md round-3 study).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu import configs, losses, train


def _toy(d=8, stride=4, b=1, h=8, w=16):
    rng = np.random.default_rng(0)
    gt = jnp.asarray(
        rng.uniform(0, (d - 1) * stride, (b, h, w)).astype(np.float32)
    )
    valid = jnp.ones((b, h, w), bool)
    return gt, valid


def test_ce_minimized_by_matching_cost():
    """Cost whose softmax equals the Gaussian target scores lower than a
    uniform (collapsed) cost volume and than a wrong-peak volume."""
    d, stride = 8, 4
    gt, valid = _toy(d, stride)
    gt_bin = gt[:, ::stride, ::stride] / stride
    bins = jnp.arange(d, dtype=jnp.float32)
    # matching: -cost proportional to the target log-potential
    matching = (bins - gt_bin[..., None]) ** 2 / 2.0
    uniform = jnp.zeros_like(matching)
    wrong = (bins - (d - 1 - gt_bin)[..., None]) ** 2 / 2.0

    args = (gt, valid, stride)
    l_match = float(losses.disparity_classification_loss(matching, *args))
    l_unif = float(losses.disparity_classification_loss(uniform, *args))
    l_wrong = float(losses.disparity_classification_loss(wrong, *args))
    assert l_match < l_unif < l_wrong


def test_ce_ignores_invalid_and_out_of_range():
    d, stride = 8, 4
    gt, valid = _toy(d, stride)
    cost = jnp.zeros(
        (gt.shape[0], gt.shape[1] // stride, gt.shape[2] // stride, d)
    )
    base = float(
        losses.disparity_classification_loss(cost, gt, valid, stride)
    )
    # Poison one subsampled pixel with an out-of-range GT: masked out.
    gt_bad = gt.at[0, 0, 0].set(10 * d * stride)
    got = float(
        losses.disparity_classification_loss(cost, gt_bad, valid, stride)
    )
    # Uniform cost has identical CE at every valid pixel, so the mean is
    # unchanged when one pixel drops out.
    np.testing.assert_allclose(got, base, rtol=1e-6)
    # All-invalid → exactly zero (guarded denominator).
    none = float(
        losses.disparity_classification_loss(
            cost, gt, jnp.zeros_like(valid), stride
        )
    )
    assert none == 0.0


def test_stereo_train_step_refine_plus_aux_ce():
    """Both flags together: returns are (disp, aux, cost) — pin the
    unpacking order and that the combined loss is finite and descends."""
    cfg = configs.get("stereo_256x512_b4")
    stereo = dataclasses.replace(
        cfg.stereo,
        height=32,
        width=64,
        max_disp=16,
        feat_channels=8,
        agg_channels=(8, 8, 8, 8),
        refine=True,
        aux_ce_weight=0.5,
    )
    cfg = dataclasses.replace(cfg, batch_size=2, stereo=stereo, dtype="float32")
    rng = np.random.default_rng(4)
    batch = {
        "left": jnp.asarray(
            rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8)
        ),
        "right": jnp.asarray(
            rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8)
        ),
        "gt_disp": jnp.asarray(
            rng.uniform(0, 12, (2, 32, 64)).astype(np.float32)
        ),
        "valid": jnp.ones((2, 32, 64), bool),
    }
    state = train.make_train_state(cfg, seed=0, learning_rate=1e-3)
    step = train.make_stereo_train_step(cfg)
    state, m0 = step(state, batch)
    assert np.isfinite(float(m0["loss"]))
    for _ in range(5):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"])


def test_stereo_train_step_with_aux_ce_runs_and_descends():
    cfg = configs.get("stereo_256x512_b4")
    stereo = dataclasses.replace(
        cfg.stereo,
        height=32,
        width=64,
        max_disp=16,
        feat_channels=8,
        agg_channels=(8, 8, 8, 8),
        aux_ce_weight=1.0,
    )
    cfg = dataclasses.replace(cfg, batch_size=2, stereo=stereo, dtype="float32")
    rng = np.random.default_rng(1)
    batch = {
        "left": jnp.asarray(
            rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8)
        ),
        "right": jnp.asarray(
            rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8)
        ),
        "gt_disp": jnp.asarray(
            rng.uniform(0, 12, (2, 32, 64)).astype(np.float32)
        ),
        "valid": jnp.ones((2, 32, 64), bool),
    }
    state = train.make_train_state(cfg, seed=0, learning_rate=1e-3)
    step = train.make_stereo_train_step(cfg)
    state, m0 = step(state, batch)
    loss_prev = float(m0["loss"])
    for _ in range(5):
        state, m = step(state, batch)
    assert float(m["loss"]) < loss_prev
