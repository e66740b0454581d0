"""Fused decoder-tail v2 (per-phase dense dots) vs the XLA oracle —
same contract as tests/test_fused_tail.py: y1p → double-packed y0pp
through packed u00, ELU, collapsed u01, ELU, including the stage-2
grouped-duplication border rule and the per-phase kernel slicing
(phase_split_stage1/2 must drop ONLY structural zeros)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.ops import collapsed, packed
from scenedepthestimation_tpu.ops.pallas.fused_tail_v2 import (
    fused_tail_pallas_v2,
    stage1_dx_kernels,
    stage2_phase_kernels,
)


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
def test_fused_tail_v2_matches_oracle(h4, w4):
    c1, c0 = 12, 4  # packed channels: y1p 4*c1, zp 4*c0
    rng = np.random.default_rng(0)
    y1p = jnp.asarray(rng.normal(size=(2, h4, w4, 4 * c1)).astype(np.float32))
    k00 = jnp.asarray(rng.normal(size=(3, 3, c1, c0)).astype(np.float32) * 0.2)
    b00 = jnp.asarray(rng.normal(size=(c0,)).astype(np.float32))
    k01 = jnp.asarray(rng.normal(size=(3, 3, c0, c0)).astype(np.float32) * 0.2)
    b01 = jnp.asarray(rng.normal(size=(c0,)).astype(np.float32))

    want = np.asarray(
        packed.space_to_depth(_oracle(y1p, k00, b00, k01, b01))
    )

    w00p = packed.pack_conv3x3_kernel(k00)
    w01pp = packed.pack_conv3x3_kernel(
        collapsed.collapse_upsample_conv_kernel(k01)
    )
    got = np.asarray(
        fused_tail_pallas_v2(
            y1p, w00p, jnp.tile(b00, 4), w01pp, jnp.tile(b01, 4 * 4),
            interpret=True,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_phase_kernels_drop_only_zeros():
    """Reassembling a packed conv from the per-phase/per-dx matrices
    must reproduce it (row-phase splitting drops ONLY the structural
    zero tap rows): run both on an interior window (border-free)."""
    rng = np.random.default_rng(1)
    c, co = 6, 4
    k = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32))
    kp = packed.pack_conv3x3_kernel(k)  # (3, 3, 4c, 4co)
    x = jnp.asarray(rng.normal(size=(1, 10, 12, 4 * c)).astype(np.float32))

    import jax.lax as lax

    want = lax.conv_general_dilated(
        x, kp, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )  # (1, 8, 10, 4co)

    h_out, w_out = 8, 10

    # stage-2 form: per row-phase K=2*(4c) row-concat, dx-union N.
    w2 = stage2_phase_kernels(kp)  # (2, 3, 2*4c, 2*co)
    halves = []
    for a in (0, 1):
        x2 = jnp.concatenate(
            [x[0, a : a + h_out], x[0, a + 1 : a + 1 + h_out]], axis=-1
        )
        acc = 0
        for dx in range(3):
            acc = acc + jnp.einsum(
                "hwk,kn->hwn", x2[:, dx : dx + w_out], w2[a, dx]
            )
        halves.append(acc)
    got = jnp.concatenate(halves, axis=-1)[None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # stage-1 form: K=3*(4c) im2row, per-dx kernels, full N.
    w1 = stage1_dx_kernels(kp)  # (3, 3*4c, 4co)
    x1 = jnp.concatenate(
        [x[0, 0:h_out], x[0, 1 : 1 + h_out], x[0, 2 : 2 + h_out]], axis=-1
    )
    acc = 0
    for dx in range(3):
        acc = acc + jnp.einsum(
            "hwk,kn->hwn", x1[:, dx : dx + w_out], w1[dx]
        )
    np.testing.assert_allclose(
        np.asarray(acc[None]), np.asarray(want), atol=1e-5
    )


def test_collapsed_decoder_fused_v2_dispatch_matches_xla():
    """collapsed_mono_decoder with the v2 fused tail forced ON
    (interpreter stands in for the TPU) == the plain XLA path."""
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
        collapsed.set_use_fused_tail("v2")
        got = run()
    finally:
        collapsed.set_use_fused_tail(None)
    np.testing.assert_allclose(got, want, atol=1e-5)
