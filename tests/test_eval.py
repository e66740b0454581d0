"""Eval-harness tests (SURVEY §3.3 / C20) over synthetic datasets."""

import numpy as np
import pytest

from scenedepthestimation_tpu.configs import (
    EvalConfig,
    MonoConfig,
    RunConfig,
    StereoConfig,
)
from scenedepthestimation_tpu.api import load_weights
from scenedepthestimation_tpu.evaluate import (
    eval_mono_dataset,
    eval_stereo_dataset,
)

TINY_MONO = RunConfig(
    name="tiny_mono_eval", pipeline="mono", batch_size=2,
    mono=MonoConfig(height=64, width=128),
)
TINY_STEREO = RunConfig(
    name="tiny_stereo_eval", pipeline="stereo", batch_size=2,
    stereo=StereoConfig(height=64, width=128, max_disp=32, feat_channels=16),
)


class _SynthMonoDataset:
    """GT = random positive depth; images random."""

    def __init__(self, n=3, hw=(64, 128)):
        self.n, self.hw = n, hw

    def __iter__(self):
        rng = np.random.default_rng(0)
        for i in range(self.n):
            yield {
                "image": rng.integers(0, 256, (*self.hw, 3), dtype=np.uint8),
                "gt_depth": rng.uniform(1.0, 50.0, self.hw).astype(np.float32),
                "index": i,
            }


def test_eval_mono_eigen_protocol():
    predictor = load_weights(None, TINY_MONO, seed=0)
    out = eval_mono_dataset(
        predictor, _SynthMonoDataset(), EvalConfig(), "eigen", batch_size=2
    )
    assert out["count"] == 3
    for k in ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3"):
        assert np.isfinite(out[k]), k
    assert 0 <= out["a1"] <= 1


def test_eval_mono_perfect_prediction_zero_error(monkeypatch):
    """If the model predicted GT exactly, every error must be ~0."""
    predictor = load_weights(None, TINY_MONO, seed=0)
    ds = list(_SynthMonoDataset(n=2))

    def fake_forward(img):
        import jax.numpy as jnp

        b = img.shape[0]
        depths = np.stack(
            [ds[min(i, 1)]["gt_depth"] for i in range(b)]
        )
        return {"depth": jnp.asarray(depths), "disp": jnp.asarray(1.0 / depths)}

    monkeypatch.setattr(predictor, "mono_forward", fake_forward)
    out = eval_mono_dataset(predictor, iter(ds), EvalConfig(), "eigen", batch_size=2)
    assert out["abs_rel"] == pytest.approx(0.0, abs=1e-6)
    assert out["a1"] == pytest.approx(1.0)


def test_eval_mono_max_items():
    predictor = load_weights(None, TINY_MONO, seed=0)
    out = eval_mono_dataset(
        predictor, _SynthMonoDataset(n=3), EvalConfig(), "eigen",
        batch_size=2, max_items=2,
    )
    assert out["count"] == 2


class _SynthStereoDataset:
    def __init__(self, n=2, hw=(64, 128)):
        self.n, self.hw = n, hw

    def __iter__(self):
        rng = np.random.default_rng(1)
        for i in range(self.n):
            gt = rng.uniform(1.0, 30.0, self.hw).astype(np.float32)
            yield {
                "left": rng.integers(0, 256, (*self.hw, 3), dtype=np.uint8),
                "right": rng.integers(0, 256, (*self.hw, 3), dtype=np.uint8),
                "gt_disp": gt,
                "valid": gt > 0,
                "index": i,
            }


def test_eval_stereo_epe_d1():
    predictor = load_weights(None, TINY_STEREO, seed=0)
    out = eval_stereo_dataset(
        predictor, _SynthStereoDataset(), EvalConfig(), batch_size=2
    )
    assert out["count"] == 2
    assert np.isfinite(out["epe"]) and out["epe"] >= 0
    assert 0 <= out["d1_all"] <= 1
