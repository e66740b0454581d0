"""Fused decoder-tail Pallas kernel (ops/pallas/fused_tail.py) vs the
XLA oracle (ops/collapsed.py): y1p → y0p must match through the packed
u00 conv, ELU, the collapsed u01 conv, ELU, and the output
depth-to-space — including the subtle stage-2 border rule (packing an
EDGE-bordered conv needs channel-group-duplicated halos, not edge).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.ops import collapsed, packed
from scenedepthestimation_tpu.ops.pallas.fused_tail import fused_tail_pallas


def _oracle(y1p, k00, b00, k01, b01):
    zp = jax.nn.elu(
        collapsed.conv3x3_edge(y1p, packed.pack_conv3x3_kernel(k00))
        + jnp.tile(b00, 4)
    )
    z = packed.depth_to_space(zp)
    return jax.nn.elu(
        collapsed.conv3x3_edge(z, collapsed.collapse_upsample_conv_kernel(k01))
        + jnp.tile(b01, 4)
    )


@pytest.mark.parametrize("h4,w4", [(8, 16), (12, 8)])
def test_fused_tail_matches_oracle(h4, w4):
    c1, c0 = 12, 4  # packed channels: y1p 4*c1, zp 4*c0
    rng = np.random.default_rng(0)
    y1p = jnp.asarray(rng.normal(size=(2, h4, w4, 4 * c1)).astype(np.float32))
    k00 = jnp.asarray(rng.normal(size=(3, 3, c1, c0)).astype(np.float32) * 0.2)
    b00 = jnp.asarray(rng.normal(size=(c0,)).astype(np.float32))
    k01 = jnp.asarray(rng.normal(size=(3, 3, c0, c0)).astype(np.float32) * 0.2)
    b01 = jnp.asarray(rng.normal(size=(c0,)).astype(np.float32))

    # The kernel emits the DOUBLE-packed layout (no in-kernel d2s).
    want = np.asarray(
        packed.space_to_depth(_oracle(y1p, k00, b00, k01, b01))
    )

    w00p = packed.pack_conv3x3_kernel(k00)
    w01pp = packed.pack_conv3x3_kernel(
        collapsed.collapse_upsample_conv_kernel(k01)
    )
    got = np.asarray(
        fused_tail_pallas(
            y1p, w00p, jnp.tile(b00, 4), w01pp, jnp.tile(b01, 4 * 4),
            interpret=True,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pad_packed_edge_matches_unpacked_edge_conv():
    """conv3x3_edge on the unpacked plane == VALID conv with
    pad_packed_edge on the packed plane (the grouped-edge border rule)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 12, 16, 6)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 5)).astype(np.float32) * 0.2)

    want = packed.space_to_depth(collapsed.conv3x3_edge(x, k))
    import jax.lax as lax

    got = lax.conv_general_dilated(
        collapsed.pad_packed_edge(packed.space_to_depth(x)),
        packed.pack_conv3x3_kernel(k),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_collapsed_decoder_fused_dispatch_matches_xla():
    """collapsed_mono_decoder with the fused tail forced ON (interpreter
    stands in for the TPU) == the XLA path == the standard decoder."""
    from scenedepthestimation_tpu.configs import MonoConfig
    from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    cfg = MonoConfig(height=64, width=128)
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 64, 128, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    feats = ResNetEncoder(num_layers=cfg.num_layers).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )

    def run():
        return np.asarray(
            collapsed.collapsed_mono_decoder(
                variables["params"]["decoder"], feats,
                dec_channels=cfg.dec_channels, upsample_mode=cfg.upsample_mode,
            )
        )

    collapsed.set_use_fused_tail(False)
    want = run()
    try:
        collapsed.set_use_fused_tail(True)
        got = run()
    finally:
        collapsed.set_use_fused_tail(None)
    np.testing.assert_allclose(got, want, atol=1e-5)
