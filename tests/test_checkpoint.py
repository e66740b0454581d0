"""Checkpoint round-trips (SURVEY C16, §5.4): Orbax native format and
reference-style torch .pth directories, both through the public
load_weights surface."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.api import load_weights, predict_mono
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig
from scenedepthestimation_tpu.utils import checkpoint

TINY = RunConfig(
    name="tiny_ckpt", pipeline="mono", mono=MonoConfig(height=64, width=128)
)


def test_orbax_roundtrip_through_api(tmp_path):
    p1 = load_weights(None, TINY, seed=0)
    path = str(tmp_path / "ckpt")
    checkpoint.save_variables(path, p1.variables)

    p2 = load_weights(path, TINY)
    img = np.random.default_rng(0).integers(0, 256, (64, 128, 3), np.uint8)
    out1 = predict_mono(p1, img)
    out2 = predict_mono(p2, img)
    np.testing.assert_array_equal(out1["depth"], out2["depth"])


def test_torch_pth_dir_through_api(tmp_path):
    """Reference-family layout: encoder.pth + depth.pth in a directory."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
    import torch
    import torch_ref

    torch.manual_seed(0)
    tmodel = torch_ref.MonoDepthNet().eval()
    enc_state = tmodel.encoder.state_dict()
    dec_state = tmodel.decoder.state_dict()
    torch.save(enc_state, str(tmp_path / "encoder.pth"))
    torch.save(dec_state, str(tmp_path / "depth.pth"))

    predictor = load_weights(str(tmp_path), TINY)
    x = np.random.default_rng(1).normal(size=(1, 64, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy()
    got = np.asarray(
        predictor.model.apply(predictor.variables, jnp.asarray(x))[0]
    )
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-6)


def test_load_rejects_unknown_path(tmp_path):
    with pytest.raises(ValueError, match="unrecognized checkpoint"):
        checkpoint.load_variables(str(tmp_path / "nope.bin"))


def test_trainer_save_loadable(tmp_path):
    from scenedepthestimation_tpu import train

    state = train.make_train_state(TINY, seed=0)
    trainer = train.Trainer(cfg=TINY)
    path = str(tmp_path / "trained")
    trainer.save(state, path)
    p = load_weights(path, TINY)
    img = np.zeros((64, 128, 3), np.uint8)
    out = predict_mono(p, img)
    assert out["depth"].shape == (64, 128)


def test_single_torch_file_through_api(tmp_path):
    """Combined full-model .pth (encoder.* + decoder.* prefixes) loaded
    through the file path of load_weights."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
    import torch
    import torch_ref

    torch.manual_seed(2)
    tmodel = torch_ref.MonoDepthNet().eval()
    path = str(tmp_path / "model.pth")
    torch.save(tmodel.state_dict(), path)

    predictor = load_weights(path, TINY)
    x = np.random.default_rng(3).normal(size=(1, 64, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy()
    got = np.asarray(predictor.model.apply(predictor.variables, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-6)


def test_temporal_checkpoint_loadable_by_predict(tmp_path):
    """Temporal train saves must be predict-compatible (depth-only at
    path, pose alongside) — the joint {'depth','pose'} layout is not."""
    from scenedepthestimation_tpu import train

    state = train.make_temporal_train_state(TINY, seed=0)
    path = str(tmp_path / "tck")
    train.save_predict_artifact(state, path)
    p = load_weights(path, TINY)
    out = predict_mono(p, np.zeros((64, 128, 3), np.uint8))
    assert out["depth"].shape == (64, 128)
    import os

    assert os.path.isdir(path + "_pose")
