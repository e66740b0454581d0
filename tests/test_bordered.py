"""Bordered-carry tail (ops/bordered.py): exactness against the per-op
v2 strip path, which is itself pinned to the module decoder."""

import numpy as np
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.configs import MonoConfig
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.ops import bordered as B
from scenedepthestimation_tpu.ops import collapsed


def _decoder_out(
    variables, feats, cfg, use_bordered, minmax=None, full=False, u10=False,
    u21=False,
):
    collapsed.set_use_bordered(use_bordered, full=full, u10=u10, u21=u21)
    try:
        return collapsed.collapsed_mono_decoder(
            variables["params"]["decoder"],
            feats,
            dec_channels=cfg.dec_channels,
            upsample_mode=cfg.upsample_mode,
            disp_to_depth_minmax=minmax,
        )
    finally:
        collapsed.set_use_bordered(True, full=False, u10=False, u21=False)


def test_bordered_tail_matches_v2_strip_path():
    cfg = MonoConfig(height=64, width=128)
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 64, 128, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    want = np.asarray(_decoder_out(variables, feats, cfg, False))
    got = np.asarray(_decoder_out(variables, feats, cfg, True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Fused disp→depth epilogue path too (returns {disp, depth}).
    want_m = _decoder_out(variables, feats, cfg, False, minmax=(0.1, 100.0))
    got_m = _decoder_out(variables, feats, cfg, True, minmax=(0.1, 100.0))
    for key in ("disp", "depth"):
        np.testing.assert_allclose(
            np.asarray(got_m[key]), np.asarray(want_m[key]),
            atol=1e-5, rtol=1e-5, err_msg=key,
        )


def test_full_bordered_chain_matches_v2():
    """Inputs large enough for the coarse-level bands (f4 >= 8) engage
    the FULL bordered chain (levels 4..2 carried, one reset per level).
    Pin it against the per-op v2 path."""
    cfg = MonoConfig(height=256, width=256, dec_channels=(4, 8, 8, 8, 8))
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(1, 256, 256, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    assert feats[-1].shape[1] >= 8  # full-chain gate engaged
    want = np.asarray(_decoder_out(variables, feats, cfg, False))
    got = np.asarray(_decoder_out(variables, feats, cfg, True, full=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bordered_u10_carry_matches_v2():
    """Carry started at upconv_1_0 (_BORDERED_U10) == the v2 path."""
    cfg = MonoConfig(height=64, width=128)
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(13).normal(size=(2, 64, 128, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    want = np.asarray(_decoder_out(variables, feats, cfg, False))
    got = np.asarray(_decoder_out(variables, feats, cfg, True, u10=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bordered_u21_carry_matches_v2():
    """Carry started at upconv_2_1 (_BORDERED_U21) == the v2 path.
    Input large enough to pass the f1 >= 32 gate (asymmetric shape)."""
    cfg = MonoConfig(height=128, width=256, dec_channels=(4, 8, 8, 8, 8))
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(17).normal(size=(1, 128, 256, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    assert feats[1].shape[1] >= 32 and feats[1].shape[2] >= 32
    want = np.asarray(_decoder_out(variables, feats, cfg, False))
    got = np.asarray(_decoder_out(variables, feats, cfg, True, u21=True))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # Fused disp→depth epilogue rides the same carry.
    want_m = _decoder_out(variables, feats, cfg, False, minmax=(0.1, 100.0))
    got_m = _decoder_out(variables, feats, cfg, True, u21=True, minmax=(0.1, 100.0))
    for key in ("disp", "depth"):
        np.testing.assert_allclose(
            np.asarray(got_m[key]), np.asarray(want_m[key]),
            atol=1e-5, rtol=1e-5, err_msg=key,
        )


def test_full_bordered_chain_asymmetric_shape():
    """H != W through the full chain — catches any row/col transposition
    in the band halos, upsample_concat band slices, or widen."""
    cfg = MonoConfig(height=256, width=320, dec_channels=(4, 8, 8, 8, 8))
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(1, 256, 320, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    want = np.asarray(_decoder_out(variables, feats, cfg, False))
    got = np.asarray(_decoder_out(variables, feats, cfg, True, full=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bordered_conv3x3_reflect_matches_nopad():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 24, 40, 8)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 8)).astype(np.float32))
    k2 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 8)).astype(np.float32))
    want = collapsed.conv3x3_nopad(
        collapsed.conv3x3_nopad(x, k1, mode="reflect"), k2, mode="reflect"
    )
    # Seed a bordered tensor from the exact first conv, then one
    # bordered conv; assemble and compare.
    y1 = collapsed.conv3x3_nopad(x, k1, mode="reflect")
    bt = B.Bordered(
        mid=jax.lax.conv_general_dilated(
            x, k1, (1, 1), ((1, 1), (1, 1)), dimension_numbers=B.DN
        ),
        top=y1[:, :1],
        bot=y1[:, -1:],
        left=y1[:, :, :1],
        right=y1[:, :, -1:],
    )
    bt = B.bordered_conv3x3(bt, k2, mode="reflect")
    got = B.bordered_assemble(bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
