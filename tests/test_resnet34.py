"""ResNet-34 encoder option (SURVEY C6: the BasicBlock depth between
18 and 50 — monodepth2's --num_layers accepts it, so ours does too).

Parity against the torch re-derivation through the .pth import path,
plus end-to-end mono decoder compatibility.
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


def test_resnet34_feature_parity():
    torch.manual_seed(3)
    tenc = torch_ref.ResNetEncoder(num_layers=34).eval()
    variables = convert_state_dict(tenc.state_dict())

    x = np.random.default_rng(6).normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        tfeats = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    enc = ResNetEncoder(num_layers=34)
    jfeats = enc.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    assert enc.num_ch_enc == (64, 64, 128, 256, 512)
    assert len(jfeats) == 5
    for lvl, (jf, tf) in enumerate(zip(jfeats, tfeats)):
        np.testing.assert_allclose(
            np.asarray(jf),
            tf.numpy().transpose(0, 2, 3, 1),
            atol=2e-6,
            rtol=1e-5,
            err_msg=f"encoder level {lvl}",
        )


def test_resnet34_end_to_end_decoder():
    import dataclasses

    from scenedepthestimation_tpu import api, configs

    cfg = configs.get("mono_kitti_192x640_fp32")
    cfg = dataclasses.replace(
        cfg,
        mono=dataclasses.replace(cfg.mono, num_layers=34, height=64, width=128),
    )
    predictor = api.load_weights(None, cfg, seed=0)
    img = np.random.default_rng(7).integers(
        0, 256, (64, 128, 3), dtype=np.uint8
    )
    out = api.predict_mono(predictor, img)
    assert out["depth"].shape == (64, 128)
    assert np.isfinite(out["depth"]).all()
