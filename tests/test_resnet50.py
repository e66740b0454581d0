"""ResNet-50 (Bottleneck) encoder option (SURVEY C6 widening).

Parity against the torch re-derivation through the .pth import path,
pyramid channel plan, end-to-end decoder compatibility, and BN folding.
"""

import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torch_ref  # noqa: E402
from scenedepthestimation_tpu.models.resnet import ResNetEncoder  # noqa: E402
from scenedepthestimation_tpu.utils.torch_import import convert_state_dict  # noqa: E402


def test_resnet50_feature_parity():
    torch.manual_seed(2)
    tenc = torch_ref.ResNetEncoder(num_layers=50).eval()
    variables = convert_state_dict(tenc.state_dict())

    x = np.random.default_rng(5).normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        tfeats = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    enc = ResNetEncoder(num_layers=50)
    jfeats = enc.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    assert enc.num_ch_enc == (64, 256, 512, 1024, 2048)
    assert len(jfeats) == 5
    for lvl, (jf, tf) in enumerate(zip(jfeats, tfeats)):
        assert jf.shape[-1] == enc.num_ch_enc[lvl]
        np.testing.assert_allclose(
            np.asarray(jf),
            tf.numpy().transpose(0, 2, 3, 1),
            atol=5e-6,
            rtol=1e-5,
            err_msg=f"encoder level {lvl}",
        )


def test_resnet50_mono_end_to_end():
    """The decoder + collapsed path accept the 2048-channel pyramid."""
    from scenedepthestimation_tpu.configs import MonoConfig
    from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
    from scenedepthestimation_tpu.ops.collapsed import collapsed_mono_decoder

    cfg = MonoConfig(height=64, width=128, num_layers=50)
    model = MonoDepthNet(cfg=cfg)
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 64, 128, 3)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x)
    want = np.asarray(model.apply(variables, x)[0])
    assert want.shape == (1, 64, 128, 1)

    feats = ResNetEncoder(num_layers=50).apply(
        {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        },
        x,
    )
    got = np.asarray(
        collapsed_mono_decoder(
            variables["params"]["decoder"], feats,
            dec_channels=cfg.dec_channels, upsample_mode=cfg.upsample_mode,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resnet50_folded_matches_unfolded():
    from scenedepthestimation_tpu.models.folded import (
        fold_encoder_bn,
        folded_encoder_apply,
    )

    rng = np.random.default_rng(7)
    enc = ResNetEncoder(num_layers=50)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 48, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(1), x)

    def rnd(path, a):
        name = "/".join(str(p) for p in path)
        if "mean" in name:
            return jnp.asarray(rng.normal(0, 0.5, a.shape).astype(np.float32))
        if "var" in name:
            return jnp.asarray(rng.uniform(0.2, 2.0, a.shape).astype(np.float32))
        return a

    stats = jax.tree_util.tree_map_with_path(rnd, variables["batch_stats"])

    want = enc.apply({"params": variables["params"], "batch_stats": stats}, x)
    folded = fold_encoder_bn(variables["params"], stats, num_layers=50)
    got = folded_encoder_apply(folded, x, num_layers=50)
    for lvl, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-5,
            err_msg=f"level {lvl}",
        )
