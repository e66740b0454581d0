"""Space-to-depth packed decoder equivalence (ops/packed.py).

The packed path must be numerically identical (to fp32 reassociation
error) to the standard DepthDecoder — it is an execution-layout rewrite,
not an architecture change.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.configs import MonoConfig
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.ops import packed
from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_xla


def test_s2d_d2s_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 5)))
    np.testing.assert_array_equal(
        np.asarray(packed.depth_to_space(packed.space_to_depth(x))), np.asarray(x)
    )


def test_s2d_group_order():
    """Channel group g = 2a+b holds pixel (2i+a, 2j+b)."""
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    s = packed.space_to_depth(x)
    for a in (0, 1):
        for b in (0, 1):
            np.testing.assert_array_equal(
                np.asarray(s[..., 2 * a + b]), np.asarray(x[:, a::2, b::2, 0])
            )


@pytest.mark.parametrize("cin,cout", [(5, 3), (16, 16)])
def test_packed_conv_matches_reflect_conv(cin, cout):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

    want = conv3x3_xla(x, k, b, "elu")
    got = packed.depth_to_space(
        packed.conv3x3_packed(
            packed.space_to_depth(x), packed.pack_conv3x3_kernel(k), b, "elu"
        )
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_packed_upsample_tile_equivalence():
    """packed(upsample2x_nearest(x)) == tile(x, 4) in group-major layout."""
    from scenedepthestimation_tpu.ops.upsample import upsample2x

    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 6, 8, 3)))
    np.testing.assert_array_equal(
        np.asarray(packed.space_to_depth(upsample2x(x, mode="nearest"))),
        np.asarray(jnp.tile(x, (1, 1, 1, 4))),
    )


def test_pallas_edge_border_conv_matches_xla(monkeypatch):
    """The Pallas packed conv (edge border, fused sigmoid/ELU) must match
    the XLA lowering — interpret mode stands in for the TPU."""
    from scenedepthestimation_tpu.ops.pallas.conv_block import conv3x3_elu_pallas

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 16, 24, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    kp = packed.pack_conv3x3_kernel(k)
    bias4 = jnp.tile(b, 4)

    xp = packed.space_to_depth(x)
    for act in ("elu", "sigmoid", "none"):
        want = packed.conv3x3_packed(
            xp, kp, b, None if act == "none" else act, use_pallas=False
        )
        got = conv3x3_elu_pallas(
            xp, kp, bias4, activation=act, border="edge", interpret=True,
            out_dtype=jnp.float32 if act == "sigmoid" else None,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, err_msg=act
        )


def test_packed_mono_decoder_matches_standard():
    """End-to-end: packed decoder == DepthDecoder scale-0, fp32."""
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
        packed.packed_mono_decoder(
            variables["params"]["decoder"],
            feats,
            dec_channels=cfg.dec_channels,
            upsample_mode=cfg.upsample_mode,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
