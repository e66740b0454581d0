"""Collapsed-upsample decoder equivalence (ops/collapsed.py).

The collapsed path folds the nearest upsample into the following conv
(one half-res conv emitting the s2d-packed full-res result). It must be
numerically identical (to fp32 reassociation error) to the standard
DepthDecoder — an execution-layout rewrite, not an architecture change.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.configs import MonoConfig
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.ops import collapsed, packed
from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla
from scenedepthestimation_tpu.ops.upsample import upsample2x


@pytest.mark.parametrize("cin,cout", [(5, 3), (16, 16)])
def test_collapsed_kernel_matches_conv_of_upsample(cin, cout):
    """conv3x3_reflect(upsample2x(z)) == d2s(conv3x3_edge(z, collapsed))."""
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 7, 9, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    want = conv3x3_xla(upsample2x(z, mode="nearest"), k, b, "elu")
    kp = collapsed.collapse_upsample_conv_kernel(k)
    got = packed.depth_to_space(
        jax.nn.elu(collapsed.conv3x3_edge(z, kp) + jnp.tile(b, 4))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_collapsed_kernel_group_layout():
    """Output channel (2a+b)*Co + o is parity group (a, b) of channel o —
    the same g-major order as ops/packed.space_to_depth."""
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.normal(size=(1, 5, 6, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 2)).astype(np.float32))
    y = conv3x3_xla(upsample2x(z, mode="nearest"), k, jnp.zeros((2,)), "none")
    yp = collapsed.conv3x3_edge(z, collapsed.collapse_upsample_conv_kernel(k))
    for a in (0, 1):
        for b in (0, 1):
            for o in (0, 1):
                np.testing.assert_allclose(
                    np.asarray(yp[..., (2 * a + b) * 2 + o]),
                    np.asarray(y[:, a::2, b::2, o]),
                    atol=1e-5,
                )


@pytest.mark.parametrize("cin,cout", [(5, 3), (8, 4)])
def test_strided_skip_conv_matches_reflect_conv(cin, cout):
    """s2d(conv3x3_reflect(x)) == strided_skip_conv(x) (packed output
    computed directly by the stride-2 4x4 form)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)

    want = packed.space_to_depth(
        conv3x3_xla(x, k, jnp.zeros((cout,)), "none")
    )
    got = collapsed.strided_skip_conv(x, collapsed.strided_skip_conv_kernel(k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_colpack_conv_matches_edge_conv():
    """Column-packed conv == conv3x3_edge (tiny-Cout MXU formulation)."""
    rng = np.random.default_rng(9)
    block = 8
    x = jnp.asarray(rng.normal(size=(2, 6, 4 * block, 10)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(3, 3, 10, 4)).astype(np.float32) * 0.1)

    want = collapsed.conv3x3_edge(x, kp)
    got = collapsed.colpack_conv_edge(
        x, collapsed.colpack_conv_kernel(kp, block), 4, block
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_stereo_program_packed_agg_matches_module():
    """build_stereo_program with packed_agg == the module path."""
    import dataclasses

    from scenedepthestimation_tpu import api, configs

    base = configs.get("stereo_256x512_b4")
    base = dataclasses.replace(
        base,
        stereo=dataclasses.replace(
            base.stereo, height=64, width=128, max_disp=32, feat_channels=16
        ),
    )
    rng = np.random.default_rng(12)
    left = rng.integers(0, 256, (1, 64, 128, 3), dtype=np.uint8)
    right = rng.integers(0, 256, (1, 64, 128, 3), dtype=np.uint8)

    outs = {}
    for packed in (False, True):
        cfg = dataclasses.replace(
            base, stereo=dataclasses.replace(base.stereo, packed_agg=packed)
        )
        predictor = api.load_weights(None, cfg, seed=0)
        program = api.build_stereo_program(cfg, predictor.model)
        outs[packed] = np.asarray(
            program(predictor.variables, jnp.asarray(left), jnp.asarray(right))[
                "disp"
            ]
        )
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-4)


def test_stereo_program_paired_pre_matches_per_view():
    """api._PAIRED_PRE (one preprocess+tower pass over the interleaved
    pair) == the per-view preprocess path, both packed and module."""
    import dataclasses

    from scenedepthestimation_tpu import api, configs

    base = configs.get("stereo_256x512_b4")
    base = dataclasses.replace(
        base,
        stereo=dataclasses.replace(
            base.stereo, height=64, width=128, max_disp=32, feat_channels=16
        ),
    )
    rng = np.random.default_rng(21)
    # Source res != net res so the paired preprocess really resizes.
    left = rng.integers(0, 256, (2, 96, 160, 3), dtype=np.uint8)
    right = rng.integers(0, 256, (2, 96, 160, 3), dtype=np.uint8)

    for packed in (False, True):
        cfg = dataclasses.replace(
            base, stereo=dataclasses.replace(base.stereo, packed_agg=packed)
        )
        predictor = api.load_weights(None, cfg, seed=0)
        program = api.build_stereo_program(cfg, predictor.model)
        outs = {}
        for paired in (False, True):
            api.set_paired_pre(paired)
            try:
                outs[paired] = np.asarray(
                    program(
                        predictor.variables,
                        jnp.asarray(left),
                        jnp.asarray(right),
                    )["disp"]
                )
            finally:
                api.set_paired_pre(True)
        np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)


def test_fast_borders_interior_matches_exact():
    """border_mode='fast' (MonoConfig.fast_borders): zero-pad borders
    everywhere. The interior — pixels whose receptive field through the
    decoder never touches an image border — must be IDENTICAL to the
    exact path; only a border band may differ."""
    cfg = MonoConfig(height=256, width=512)
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(31).normal(size=(1, 256, 512, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    outs = {}
    for mode in ("exact", "fast"):
        outs[mode] = np.asarray(
            collapsed.collapsed_mono_decoder(
                variables["params"]["decoder"],
                feats,
                dec_channels=cfg.dec_channels,
                dtype=jnp.float32,
                border_mode=mode,
            )
        )
    assert outs["fast"].shape == outs["exact"].shape
    assert np.isfinite(outs["fast"]).all()
    # Border error propagates ~1 px per conv at each level's own
    # resolution; ~49 px at H/2 = ~100 full-res px is a safe band.
    m = 104
    np.testing.assert_allclose(
        outs["fast"][:, m:-m, m:-m], outs["exact"][:, m:-m, m:-m], atol=1e-6
    )
    # ... and the band really is where the two modes differ (sanity that
    # the flag actually changed the program).
    assert np.abs(outs["fast"] - outs["exact"]).max() > 1e-6


def test_collapsed_cost_aggregation_matches_module():
    """Stereo agg U-Net: collapsed/packed inference rewrite == module."""
    from scenedepthestimation_tpu.models.stereo import CostAggregation

    agg = CostAggregation(out_disp=6, channels=(8, 12, 16, 20))
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(2, 16, 24, 14)).astype(np.float32)
    )
    variables = agg.init(jax.random.PRNGKey(2), x)
    want = np.asarray(agg.apply(variables, x))
    got = np.asarray(
        collapsed.collapsed_cost_aggregation(variables["params"], x)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("disp_variant", ["packed", "fullres"])
def test_collapsed_mono_decoder_matches_standard(disp_variant):
    """End-to-end: collapsed decoder == DepthDecoder scale-0, fp32."""
    cfg = MonoConfig(height=64, width=128)
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 64, 128, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x)[0])

    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    got = np.asarray(
        collapsed.collapsed_mono_decoder(
            variables["params"]["decoder"],
            feats,
            dec_channels=cfg.dec_channels,
            upsample_mode=cfg.upsample_mode,
            disp_variant=disp_variant,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_collapsed_mono_decoder_collapse_hi_matches_standard():
    """Levels 4..2 collapsed (round-3 _COLLAPSE_HI) == DepthDecoder."""
    cfg = MonoConfig(height=64, width=128)
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 64, 128, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x)[0])

    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    collapsed.set_collapse_hi(True)
    try:
        got = np.asarray(
            collapsed.collapsed_mono_decoder(
                variables["params"]["decoder"],
                feats,
                dec_channels=cfg.dec_channels,
                upsample_mode=cfg.upsample_mode,
            )
        )
    finally:
        collapsed.set_collapse_hi(False)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_stereo_program_packed_agg_refine_matches_module():
    """Refine checkpoints ride the packed path too (VERDICT r2 next-#2):
    packed_agg + refine == module path + refine, same variables."""
    import dataclasses

    from scenedepthestimation_tpu import api, configs

    base = configs.get("stereo_256x512_b4")
    rng = np.random.default_rng(13)
    left = rng.integers(0, 256, (1, 64, 128, 3), dtype=np.uint8)
    right = rng.integers(0, 256, (1, 64, 128, 3), dtype=np.uint8)

    outs = {}
    variables = None
    for packed in (False, True):
        cfg = dataclasses.replace(
            base,
            stereo=dataclasses.replace(
                base.stereo,
                height=64,
                width=128,
                max_disp=32,
                feat_channels=16,
                refine=True,
                packed_agg=packed,
            ),
        )
        predictor = api.load_weights(None, cfg, seed=0)
        if variables is None:
            variables = predictor.variables  # share across both paths
        program = api.build_stereo_program(cfg, predictor.model)
        outs[packed] = np.asarray(
            program(variables, jnp.asarray(left), jnp.asarray(right))["disp"]
        )
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-4)


# --- round-3 pad-elimination (zero-pad conv + border-strip assembly) -------


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(0, scale, shape).astype(np.float32)
    )


@pytest.mark.parametrize("hw", [(8, 12), (10, 34)])
def test_conv3x3_edge_v2_matches_v1(hw):
    h, w = hw
    x = _rand((2, h, w, 6), 0)
    k = _rand((3, 3, 6, 5), 1, 0.2)
    np.testing.assert_allclose(
        np.asarray(collapsed.conv3x3_edge_v2(x, k)),
        np.asarray(collapsed.conv3x3_edge(x, k)),
        atol=1e-5,
    )


@pytest.mark.parametrize("hw", [(8, 12), (12, 20)])
def test_strided_skip_conv_v2_matches_v1(hw):
    h, w = hw
    x = _rand((2, h, w, 6), 2)
    k = _rand((3, 3, 6, 5), 3, 0.2)
    k4 = collapsed.strided_skip_conv_kernel(k)
    np.testing.assert_allclose(
        np.asarray(collapsed.strided_skip_conv_v2(x, k4)),
        np.asarray(collapsed.strided_skip_conv(x, k4)),
        atol=1e-5,
    )


def test_colpack_conv_edge_v2_matches_v1():
    x = _rand((2, 6, 64, 8), 4)
    kp = _rand((3, 3, 8, 4), 5, 0.2)
    np.testing.assert_allclose(
        np.asarray(collapsed.colpack_conv_edge_v2(x, kp)),
        np.asarray(
            collapsed.colpack_conv_edge(x, collapsed.colpack_conv_kernel(kp), 4)
        ),
        atol=1e-5,
    )


def test_collapsed_decoder_nopad_matches_pad():
    """The _USE_NOPAD execution (zero-pad + border assembly) must equal
    the materialized-pad execution bit-for-bit up to reassociation."""
    cfg = MonoConfig(height=32, width=64)
    model = MonoDepthNet(cfg=cfg, dtype=jnp.float32)
    x = _rand((1, 32, 64, 3), 6)
    variables = model.init(jax.random.PRNGKey(0), x)
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    feats = ResNetEncoder(num_layers=18, dtype=jnp.float32).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    outs = {}
    for flag in (False, True):
        collapsed.set_use_nopad(flag)
        try:
            outs[flag] = np.asarray(
                collapsed.collapsed_mono_decoder(
                    variables["params"]["decoder"], feats
                )
            )
        finally:
            collapsed.set_use_nopad(True)
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)


def test_collapsed_decoder_maps_epilogue_matches_separate():
    """disp_to_depth_minmax fused epilogue == sigmoid path + disp_to_depth."""
    from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth

    cfg = MonoConfig(height=32, width=64)
    model = MonoDepthNet(cfg=cfg, dtype=jnp.float32)
    x = _rand((1, 32, 64, 3), 7)
    variables = model.init(jax.random.PRNGKey(1), x)
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    feats = ResNetEncoder(num_layers=18, dtype=jnp.float32).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    disp_sig = collapsed.collapsed_mono_decoder(
        variables["params"]["decoder"], feats
    )
    ref_scaled, ref_depth = disp_to_depth(disp_sig[..., 0], 0.1, 100.0)
    maps = collapsed.collapsed_mono_decoder(
        variables["params"]["decoder"], feats, disp_to_depth_minmax=(0.1, 100.0)
    )
    np.testing.assert_allclose(np.asarray(maps["disp"]), np.asarray(ref_scaled), atol=1e-6)
    np.testing.assert_allclose(np.asarray(maps["depth"]), np.asarray(ref_depth), atol=1e-4)


@pytest.mark.parametrize("hw", [(8, 12), (10, 34)])
def test_conv3x3_edge_v3_matches_v1(hw):
    h, w = hw
    x = _rand((2, h, w, 6), 20)
    k = _rand((3, 3, 6, 5), 21, 0.2)
    np.testing.assert_allclose(
        np.asarray(collapsed.conv3x3_edge_v3(x, k)),
        np.asarray(collapsed.conv3x3_edge(x, k)),
        atol=1e-5,
    )


@pytest.mark.parametrize("hw", [(8, 12), (12, 20)])
def test_strided_skip_conv_v3_matches_v1(hw):
    h, w = hw
    x = _rand((2, h, w, 6), 22)
    k = _rand((3, 3, 6, 5), 23, 0.2)
    k4 = collapsed.strided_skip_conv_kernel(k)
    np.testing.assert_allclose(
        np.asarray(collapsed.strided_skip_conv_v3(x, k4)),
        np.asarray(collapsed.strided_skip_conv(x, k4)),
        atol=1e-5,
    )


@pytest.mark.parametrize("hw", [(2, 3), (3, 8), (8, 12), (10, 34)])
@pytest.mark.parametrize("mode", ["edge", "reflect"])
def test_conv3x3_nopad_matches_padded(hw, mode):
    """Direct ground truth: nopad(x, k, mode) == conv over jnp.pad(x, mode),
    including the tiny-shape fallback path (H or W < 4)."""
    h, w = hw
    if mode == "reflect" and (h < 2 or w < 2):
        pytest.skip("reflect needs >=2")
    x = _rand((2, h, w, 6), 30 + h * w)
    k = _rand((3, 3, 6, 5), 31, 0.2)
    import jax.lax as lax

    ref = lax.conv_general_dilated(
        jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode),
        k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(collapsed.conv3x3_nopad(x, k, mode=mode)),
        np.asarray(ref),
        atol=1e-5,
    )
