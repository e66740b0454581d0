"""Collapsed TRAIN forward (MonoConfig.collapsed_train): the multiscale
collapsed decoder must match the standard DepthDecoder in values AND in
gradients, and a full supervised Adam step must land on the same params.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu import losses, train
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.ops.collapsed import (
    collapsed_mono_decoder_multiscale,
)

CFG = RunConfig(
    name="t", pipeline="mono", batch_size=2,
    mono=MonoConfig(height=64, width=128),
)


def _variables_and_feats():
    model = MonoDepthNet(cfg=CFG.mono)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 64, 128, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = ResNetEncoder(num_layers=CFG.mono.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    return model, x, variables, feats


def test_multiscale_forward_matches_standard():
    from scenedepthestimation_tpu.models.unet_decoder import DepthDecoder

    _, _, variables, feats = _variables_and_feats()
    want = DepthDecoder(
        dec_channels=CFG.mono.dec_channels, scales=CFG.mono.scales
    ).apply({"params": variables["params"]["decoder"]}, feats)
    got = collapsed_mono_decoder_multiscale(
        variables["params"]["decoder"], feats,
        dec_channels=CFG.mono.dec_channels, scales=CFG.mono.scales,
    )
    assert set(got) == set(want)
    for s in want:
        np.testing.assert_allclose(
            np.asarray(got[s]), np.asarray(want[s]), atol=2e-6,
            err_msg=f"scale {s}",
        )


def test_collapsed_train_step_matches_standard_step():
    """One supervised Adam step through each path from the same init:
    identical losses and identical post-step params (gradient parity,
    stronger than value parity)."""
    rng = np.random.default_rng(4)
    batch = {
        "image": rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8),
        "gt_disp": rng.uniform(0.05, 0.9, (2, 64, 128, 1)).astype(np.float32),
    }

    def one_step(collapsed):
        cfg = dataclasses.replace(
            CFG, mono=dataclasses.replace(CFG.mono, collapsed_train=collapsed)
        )
        state = train.make_train_state(cfg, seed=0, learning_rate=1e-3)
        step = train.make_mono_train_step(cfg)
        state, m = step(state, batch)
        return float(m["loss"]), state

    loss_std, st_std = one_step(False)
    loss_col, st_col = one_step(True)
    assert np.isclose(loss_col, loss_std, atol=1e-5)
    leaves_std = jax.tree_util.tree_leaves(st_std.params)
    leaves_col = jax.tree_util.tree_leaves(st_col.params)
    for a, b in zip(leaves_col, leaves_std):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )
    # batch_stats must update identically too (encoder path unchanged)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_col.batch_stats),
        jax.tree_util.tree_leaves(st_std.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_collapsed_selfsup_step_runs_and_is_finite():
    rng = np.random.default_rng(5)
    cfg = dataclasses.replace(
        CFG, mono=dataclasses.replace(CFG.mono, collapsed_train=True)
    )
    batch = {
        "left": rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8),
        "right": rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8),
    }
    state = train.make_train_state(cfg, seed=0)
    step = train.make_mono_selfsup_train_step(cfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


# ---------------------------------------------------------------------------
# Stereo collapsed TRAIN (StereoConfig.collapsed_train): packed forward
# inside the supervised/selfsup steps must match the module path in loss
# AND post-step params.
# ---------------------------------------------------------------------------

from scenedepthestimation_tpu.configs import StereoConfig

# /4 grid must divide by 8 -> 64x128 -> 16x32: ok.
SCFG = RunConfig(
    name="t_stereo", pipeline="stereo", batch_size=2,
    stereo=StereoConfig(height=64, width=128, max_disp=32),
)


def _stereo_batch(rng):
    return {
        "left": rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8),
        "right": rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8),
        "gt_disp": rng.uniform(1.0, 30.0, (2, 64, 128)).astype(np.float32),
        "valid": np.ones((2, 64, 128), bool),
    }


def _one_stereo_step(collapsed, batch, aux_ce=0.0, mode="supervised"):
    cfg = dataclasses.replace(
        SCFG,
        stereo=dataclasses.replace(
            SCFG.stereo, collapsed_train=collapsed, aux_ce_weight=aux_ce
        ),
    )
    state = train.make_train_state(cfg, seed=0, learning_rate=1e-3)
    if mode == "supervised":
        step = train.make_stereo_train_step(cfg)
    else:
        step = train.make_stereo_selfsup_train_step(cfg)
    state, m = step(state, batch)
    return float(m["loss"]), state


def _assert_step_parity(loss_std, st_std, loss_col, st_col):
    assert np.isclose(loss_col, loss_std, atol=1e-4, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_col.params),
        jax.tree_util.tree_leaves(st_std.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
        )


def test_stereo_collapsed_train_step_matches_standard():
    batch = _stereo_batch(np.random.default_rng(6))
    loss_std, st_std = _one_stereo_step(False, batch)
    loss_col, st_col = _one_stereo_step(True, batch)
    _assert_step_parity(loss_std, st_std, loss_col, st_col)


def test_stereo_collapsed_train_step_with_aux_ce_matches():
    """return_cost path: the packed forward's refined cost feeds the
    disparity-classification auxiliary loss identically."""
    batch = _stereo_batch(np.random.default_rng(7))
    loss_std, st_std = _one_stereo_step(False, batch, aux_ce=0.5)
    loss_col, st_col = _one_stereo_step(True, batch, aux_ce=0.5)
    assert loss_col > 0
    _assert_step_parity(loss_std, st_std, loss_col, st_col)


def test_stereo_collapsed_selfsup_step_matches_standard():
    rng = np.random.default_rng(8)
    batch = {
        "left": rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8),
        "right": rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8),
    }
    loss_std, st_std = _one_stereo_step(False, batch, mode="selfsup")
    loss_col, st_col = _one_stereo_step(True, batch, mode="selfsup")
    _assert_step_parity(loss_std, st_std, loss_col, st_col)


def test_stereo_collapsed_train_gated_off_with_refine():
    """refine needs the module decoder's aux heads: the gate must keep
    the collapsed path off (and the step must still run)."""
    cfg = dataclasses.replace(
        SCFG,
        stereo=dataclasses.replace(
            SCFG.stereo, collapsed_train=True, refine=True
        ),
    )
    assert not train._stereo_collapsed_train(cfg)
    batch = _stereo_batch(np.random.default_rng(9))
    state = train.make_train_state(cfg, seed=0)
    step = train.make_stereo_train_step(cfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
