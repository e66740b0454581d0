"""Serving export round-trip tests (export.py)."""

import numpy as np
import pytest

from scenedepthestimation_tpu.api import load_weights, predict_mono
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig, StereoConfig
from scenedepthestimation_tpu.export import export_predictor, load_exported

TINY_MONO = RunConfig(
    name="tiny_export", pipeline="mono", mono=MonoConfig(height=64, width=128)
)
TINY_STEREO = RunConfig(
    name="tiny_export_s", pipeline="stereo",
    stereo=StereoConfig(height=32, width=64, max_disp=16, feat_channels=16),
)


def test_mono_export_roundtrip(tmp_path):
    predictor = load_weights(None, TINY_MONO, seed=0)
    artifact = export_predictor(predictor, str(tmp_path / "srv"), batch_size=2)
    assert artifact.endswith(".stablehlo")

    serve, manifest = load_exported(str(tmp_path / "srv"))
    assert manifest["pipeline"] == "mono"
    assert manifest["batch_size"] == 2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8)
    got = serve(img)
    want = predict_mono(predictor, img)
    np.testing.assert_allclose(got["depth"], want["depth"], atol=1e-6)


def test_stereo_export_roundtrip(tmp_path):
    predictor = load_weights(None, TINY_STEREO, seed=0)
    export_predictor(predictor, str(tmp_path / "srv"), batch_size=1)
    serve, manifest = load_exported(str(tmp_path / "srv"))
    rng = np.random.default_rng(1)
    l = rng.integers(0, 256, (1, 32, 64, 3), dtype=np.uint8)
    r = rng.integers(0, 256, (1, 32, 64, 3), dtype=np.uint8)
    out = serve(l, r)
    assert out["disp"].shape == (1, 32, 64)
    assert np.isfinite(out["depth"]).all()


def test_export_rejects_wrong_batch(tmp_path):
    predictor = load_weights(None, TINY_MONO, seed=0)
    export_predictor(predictor, str(tmp_path / "srv"), batch_size=2)
    serve, _ = load_exported(str(tmp_path / "srv"))
    img = np.zeros((3, 64, 128, 3), np.uint8)  # wrong batch
    with pytest.raises(Exception):
        serve(img)


def test_export_bakes_source_resolution(tmp_path):
    """Exporting with a source-resolution input bakes the resize."""
    predictor = load_weights(None, TINY_MONO, seed=0)
    export_predictor(
        predictor, str(tmp_path / "srv"), batch_size=1, input_hw=(96, 160)
    )
    serve, manifest = load_exported(str(tmp_path / "srv"))
    assert manifest["input_hw"] == [96, 160]
    img = np.zeros((1, 96, 160, 3), np.uint8)
    out = serve(img)
    assert out["depth"].shape == (1, 96, 160)
