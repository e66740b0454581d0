"""Self-supervised photometric training tests (SURVEY C14): warping op,
loss behavior, and end-to-end descent for both selfsup train steps."""

import numpy as np
import pytest
import jax.numpy as jnp

from scenedepthestimation_tpu import losses, train
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig, StereoConfig
from scenedepthestimation_tpu.ops.warp import (
    valid_mask_horizontal,
    warp_horizontal,
)


def test_warp_zero_disp_identity():
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 4, 8, 3)).astype(np.float32)
    )
    out = warp_horizontal(img, jnp.zeros((1, 4, 8)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-7)


def test_warp_integer_shift():
    img = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1))
    out = np.asarray(warp_horizontal(img, jnp.full((1, 1, 8), 2.0)))
    # x' = x - 2 with left clamp
    np.testing.assert_allclose(out[0, 0, :, 0], [0, 0, 0, 1, 2, 3, 4, 5])


def test_warp_fractional_lerp():
    img = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1))
    out = np.asarray(warp_horizontal(img, jnp.full((1, 1, 8), 0.5)))
    np.testing.assert_allclose(out[0, 0, 3, 0], 2.5, atol=1e-6)


def test_warp_onehot_matches_gather():
    """The TPU one-hot matmul warp == the gather warp, values AND the
    disp gradient, including the edge clamps — and the row-chunked
    branch (tiny _ROW_CHUNK_BYTES) agrees too."""
    import jax

    from scenedepthestimation_tpu.ops import warp as W

    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (2, 8, 16, 3)).astype(np.float32))
    # Disparities spanning negative, fractional, and out-of-frame.
    disp = jnp.asarray(
        rng.uniform(-4.0, 20.0, (2, 8, 16)).astype(np.float32)
    )

    def run(flag):
        W.set_use_onehot(flag)
        try:
            out = np.asarray(warp_horizontal(img, disp))
            g = np.asarray(
                jax.grad(lambda d: (warp_horizontal(img, d) ** 2).sum())(disp)
            )
        finally:
            W.set_use_onehot(None)
        return out, g

    out_g, grad_g = run(False)
    out_o, grad_o = run(True)
    np.testing.assert_allclose(out_o, out_g, atol=1e-6)
    np.testing.assert_allclose(grad_o, grad_g, atol=1e-5)

    old = W._ROW_CHUNK_BYTES
    W._ROW_CHUNK_BYTES = 2 * 16 * 16 * 4 * 2  # forces hc < H
    try:
        out_c, grad_c = run(True)
    finally:
        W._ROW_CHUNK_BYTES = old
    np.testing.assert_allclose(out_c, out_g, atol=1e-6)
    np.testing.assert_allclose(grad_c, grad_g, atol=1e-5)


def test_valid_mask():
    mask = np.asarray(valid_mask_horizontal(jnp.full((1, 1, 8), 3.0), 8))
    np.testing.assert_array_equal(mask[0, 0], [False] * 3 + [True] * 5)


def test_warp_is_differentiable_wrt_disp():
    import jax

    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 4, 8, 3)).astype(np.float32)
    )

    def f(d):
        return warp_horizontal(img, d).sum()

    g = jax.grad(f)(jnp.full((1, 4, 8), 1.5))
    assert np.abs(np.asarray(g)).max() > 0


def test_selfsup_loss_prefers_true_disparity():
    """Loss at the true shift must beat a wrong shift."""
    rng = np.random.default_rng(2)
    base = np.cumsum(rng.normal(0, 1, (1, 16, 64, 3)), axis=2).astype(np.float32)
    base = (base - base.min()) / np.ptp(base)
    left = jnp.asarray(base)
    true_d = 4.0
    right = warp_horizontal(left, jnp.full((1, 16, 64), -true_d))  # right = left shifted
    good = float(losses.stereo_selfsup_loss(jnp.full((1, 16, 64), true_d), left, right))
    bad = float(losses.stereo_selfsup_loss(jnp.full((1, 16, 64), true_d + 6), left, right))
    assert good < bad


TINY_STEREO = RunConfig(
    name="t_ss", pipeline="stereo", batch_size=2,
    stereo=StereoConfig(height=32, width=64, max_disp=16, feat_channels=16),
)
TINY_MONO = RunConfig(
    name="t_ms", pipeline="mono", batch_size=2,
    mono=MonoConfig(height=32, width=64),
)


def _pair_batch(hw=(32, 64)):
    rng = np.random.default_rng(3)
    base = np.cumsum(rng.normal(0, 2, (2, *hw, 3)), axis=2)
    left = ((base - base.min()) / np.ptp(base) * 255).astype(np.uint8)
    right = np.roll(left, shift=-3, axis=2)  # constant 3px disparity
    return {"left": left, "right": right}


def test_stereo_selfsup_step_decreases_loss():
    batch = _pair_batch()
    state = train.make_train_state(TINY_STEREO, seed=0, learning_rate=1e-3)
    step = train.make_stereo_selfsup_train_step(TINY_STEREO)
    for _ in range(3):
        state, m = step(state, batch)
    anchor = float(m["loss"])
    for _ in range(8):
        state, m = step(state, batch)
    assert float(m["loss"]) < anchor


def test_mono_selfsup_step_runs_and_is_finite():
    batch = _pair_batch()
    state = train.make_train_state(TINY_MONO, seed=0, learning_rate=1e-4)
    step = train.make_mono_selfsup_train_step(TINY_MONO)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    state, m2 = step(state, batch)
    assert np.isfinite(float(m2["loss"]))
    assert int(state.step) == 2


def test_mono_selfsup_step_with_augmentation():
    """augment=True (VERDICT r4 missing-#3): pair-consistent flip with
    view swap + shared jitter; clean post-flip views are the
    photometric targets. Finite loss, params update."""
    import jax as _jax

    batch = dict(_pair_batch())
    batch["rng"] = _jax.random.PRNGKey(9)
    state = train.make_train_state(TINY_MONO, seed=0, learning_rate=1e-4)
    p0 = _jax.tree_util.tree_map(np.asarray, state.params)
    step = train.make_mono_selfsup_train_step(TINY_MONO, augment=True)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(
            _jax.tree_util.tree_leaves(p0),
            _jax.tree_util.tree_leaves(state.params),
        )
    )
    assert moved
