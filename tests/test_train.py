"""Training-loop tests (SURVEY C14/C18): losses behave, steps converge."""

import numpy as np
import pytest
import jax.numpy as jnp

from scenedepthestimation_tpu import losses, train
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig, StereoConfig

TINY_MONO = RunConfig(
    name="tiny_mono_train", pipeline="mono", batch_size=2,
    mono=MonoConfig(height=32, width=64),
)
TINY_STEREO = RunConfig(
    name="tiny_stereo_train", pipeline="stereo", batch_size=2,
    stereo=StereoConfig(height=32, width=64, max_disp=16, feat_channels=16),
)


def test_ssim_identical_images_zero():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    assert float(losses.ssim(x, x).max()) < 1e-6


def test_ssim_different_images_positive():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    assert float(losses.ssim(x, y).mean()) > 0.1


def test_smooth_l1_matches_torch_convention():
    pred = jnp.asarray([0.0, 0.5, 3.0])
    tgt = jnp.asarray([0.0, 0.0, 0.0])
    out = np.asarray(losses.smooth_l1(pred, tgt))
    np.testing.assert_allclose(out, [0.0, 0.125, 2.5], atol=1e-7)


def test_edge_aware_smoothness_flat_disp_zero():
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32))
    assert float(losses.edge_aware_smoothness(disp, img)) < 1e-6


def test_stereo_loss_ignores_invalid():
    pred = jnp.zeros((1, 4, 4))
    gt = jnp.full((1, 4, 4), 100.0)
    valid = jnp.zeros((1, 4, 4), bool).at[0, 0, 0].set(True)
    gt = gt.at[0, 0, 0].set(0.5)
    loss = float(losses.stereo_supervised_loss(pred, gt, valid))
    np.testing.assert_allclose(loss, 0.125, atol=1e-6)  # only the valid px


def test_mono_train_step_decreases_loss():
    # Constant, learnable target (per-pixel random GT at lr 1e-3 over a
    # handful of steps is not guaranteed descent — BN churn dominates).
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "gt_disp": np.full((2, 32, 64, 1), 0.3, np.float32),
    }
    state = train.make_train_state(TINY_MONO, seed=0, learning_rate=3e-4)
    step = train.make_mono_train_step(TINY_MONO)
    # Let the BN running stats settle before anchoring (the first couple
    # of losses move with normalization, not with learning).
    for _ in range(5):
        state, m = step(state, batch)
    anchor = float(m["loss"])
    for _ in range(10):
        state, m = step(state, batch)
    assert float(m["loss"]) < anchor
    assert int(state.step) == 15


def test_stereo_train_step_decreases_loss():
    rng = np.random.default_rng(1)
    gt = rng.uniform(1.0, 14.0, (2, 32, 64)).astype(np.float32)
    batch = {
        "left": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "right": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "gt_disp": gt,
        "valid": np.ones_like(gt, bool),
    }
    state = train.make_train_state(TINY_STEREO, seed=0, learning_rate=1e-3)
    step = train.make_stereo_train_step(TINY_STEREO)
    state, m0 = step(state, batch)
    l0 = float(m0["loss"])
    for _ in range(8):
        state, m = step(state, batch)
    assert float(m["loss"]) < l0


def test_trainer_fit_runs_and_logs(capsys):
    rng = np.random.default_rng(2)
    batches = [
        {
            "image": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
            "gt_disp": rng.uniform(0.05, 0.9, (2, 32, 64, 1)).astype(np.float32),
        }
        for _ in range(4)
    ]
    trainer = train.Trainer(cfg=TINY_MONO, log_every=2)
    state = trainer.fit(iter(batches), num_steps=4)
    assert int(state.step) == 4
    out = capsys.readouterr().out
    assert '"loss"' in out


def test_bn_stats_update_in_train_mode():
    state = train.make_train_state(TINY_MONO, seed=0)
    step = train.make_mono_train_step(TINY_MONO)
    rng = np.random.default_rng(3)
    batch = {
        "image": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "gt_disp": rng.uniform(0.05, 0.9, (2, 32, 64, 1)).astype(np.float32),
    }
    before = np.asarray(state.batch_stats["encoder"]["bn1"]["mean"]).copy()
    state, _ = step(state, batch)
    after = np.asarray(state.batch_stats["encoder"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_mono_train_step_with_augmentation():
    import jax

    rng = np.random.default_rng(4)
    batch = {
        "image": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "gt_disp": rng.uniform(0.05, 0.9, (2, 32, 64, 1)).astype(np.float32),
        "rng": jax.random.PRNGKey(0),
    }
    state = train.make_train_state(TINY_MONO, seed=0)
    step = train.make_mono_train_step(TINY_MONO, augment=True)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_stereo_train_step_with_augmentation_grad_flow():
    """VERDICT r2 next-#5: augmented supervised stereo step — gradients
    must flow through the crop/jitter front-end to ALL params."""
    import jax

    rng = np.random.default_rng(5)
    gt = rng.uniform(1.0, 14.0, (2, 48, 80)).astype(np.float32)
    batch = {
        "left": rng.integers(0, 256, (2, 48, 80, 3), dtype=np.uint8),
        "right": rng.integers(0, 256, (2, 48, 80, 3), dtype=np.uint8),
        "gt_disp": gt,
        "valid": np.ones_like(gt, bool),
        "rng": jax.random.PRNGKey(0),
    }
    state = train.make_train_state(TINY_STEREO, seed=0, learning_rate=1e-3)
    # Materialize (the train step donates its TrainState — the live
    # device buffers are invalid after the call).
    before = [
        np.asarray(x).copy() for x in jax.tree_util.tree_leaves(state.params)
    ]
    step = train.make_stereo_train_step(TINY_STEREO, augment=True, crop=True)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    after = jax.tree_util.tree_leaves(state.params)
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    ]
    # every parameter leaf must receive a gradient through the augmented path
    assert all(moved), f"{moved.count(False)} param leaves did not move"


def test_stereo_selfsup_step_with_augmentation():
    import jax

    rng = np.random.default_rng(6)
    batch = {
        "left": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "right": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "rng": jax.random.PRNGKey(1),
    }
    state = train.make_train_state(TINY_STEREO, seed=0)
    step = train.make_stereo_selfsup_train_step(TINY_STEREO, augment=True)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_gradient_accumulation_matches_plain_step():
    """accum_steps=2 with the SAME micro-batch twice must (a) leave
    params untouched after micro-step 1 and (b) land on exactly the
    plain step's params after micro-step 2 (mean of identical grads is
    the grad, so the MultiSteps-wrapped adam applies the same update)."""
    import jax

    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "gt_disp": np.full((2, 32, 64, 1), 0.3, np.float32),
    }
    step = train.make_mono_train_step(TINY_MONO)

    plain = train.make_train_state(TINY_MONO, seed=0, learning_rate=1e-3)
    accum = train.make_train_state(
        TINY_MONO, seed=0, learning_rate=1e-3, accum_steps=2
    )
    chex_eq = lambda a, b: jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda x, y: np.allclose(np.asarray(x), np.asarray(y), atol=1e-6),
            a, b,
        )
    )

    p0 = jax.tree_util.tree_map(np.asarray, accum.params)
    accum, _ = step(accum, batch)       # micro-step 1: no update yet
    assert chex_eq(accum.params, p0)

    accum, _ = step(accum, batch)       # micro-step 2: update applies
    plain, _ = step(plain, batch)
    assert chex_eq(accum.params, plain.params)
    assert not chex_eq(accum.params, p0)
