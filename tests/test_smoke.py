"""End-to-end shape/range smoke tests (SURVEY §4.6) on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import load_weights, predict_mono, predict_stereo
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig, StereoConfig

TINY_MONO = RunConfig(
    name="tiny_mono",
    pipeline="mono",
    mono=MonoConfig(height=64, width=128),
)
TINY_STEREO = RunConfig(
    name="tiny_stereo",
    pipeline="stereo",
    stereo=StereoConfig(height=64, width=128, max_disp=32),
)


def test_presets_exist():
    for name in (
        "mono_kitti_192x640_fp32",
        "mono_nyu_480x640_b8",
        "mono_eigen_eval",
        "stereo_256x512_b4",
        "stereo_kitti2015_b16_bf16_v5e8",
    ):
        assert configs.get(name).name == name


def test_get_passes_runconfig_through():
    # benchmark.run_bench / run_train_bench accept "name or RunConfig";
    # the CLI resolves presets early (for --num-layers etc.), so get()
    # must be idempotent on an already-built config.
    cfg = configs.get("mono_kitti_192x640_fp32")
    assert configs.get(cfg) is cfg


def test_mono_predict_shapes_and_range():
    predictor = load_weights(None, TINY_MONO, seed=0)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(96, 160, 3), dtype=np.uint8)
    out = predict_mono(predictor, img)
    assert out["depth"].shape == (96, 160)
    assert out["disp"].shape == (96, 160)
    # depth bounded by the disp_to_depth constants
    assert np.all(out["depth"] >= TINY_MONO.mono.min_depth - 1e-5)
    assert np.all(out["depth"] <= TINY_MONO.mono.max_depth + 1e-3)
    assert np.all(np.isfinite(out["depth"]))


def test_mono_multiscale_heads():
    predictor = load_weights(None, TINY_MONO, seed=0)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    disps = predictor.model.apply(predictor.variables, x)
    assert set(disps.keys()) == {0, 1, 2, 3}
    for s, d in disps.items():
        assert d.shape == (1, 64 // 2**s, 128 // 2**s, 1)
        assert np.all(np.asarray(d) >= 0) and np.all(np.asarray(d) <= 1)


def test_mono_batched():
    predictor = load_weights(None, TINY_MONO, seed=0)
    imgs = np.zeros((2, 64, 128, 3), dtype=np.uint8)
    out = predict_mono(predictor, imgs)
    assert out["depth"].shape == (2, 64, 128)


def test_stereo_predict_shapes():
    predictor = load_weights(None, TINY_STEREO, seed=0)
    rng = np.random.default_rng(1)
    left = rng.integers(0, 256, size=(64, 128, 3), dtype=np.uint8)
    right = rng.integers(0, 256, size=(64, 128, 3), dtype=np.uint8)
    out = predict_stereo(predictor, left, right)
    assert out["disp"].shape == (64, 128)
    assert out["depth"].shape == (64, 128)
    # Soft-argmin output is bounded by the (full-res) disparity range.
    assert np.all(out["disp"] >= -1e-3)
    assert np.all(out["disp"] <= TINY_STEREO.stereo.max_disp + 1e-2)
    assert np.all(np.isfinite(out["depth"]))


def test_encoder_feature_pyramid():
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder(num_layers=18)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    shapes = [f.shape for f in feats]
    assert shapes == [
        (1, 32, 64, 64),
        (1, 16, 32, 64),
        (1, 8, 16, 128),
        (1, 4, 8, 256),
        (1, 2, 4, 512),
    ]


def test_resnet34_encoder():
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    enc = ResNetEncoder(num_layers=34)
    x = jnp.zeros((1, 64, 128, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
    # 34-layer plan has (3,4,6,3) blocks
    assert "layer3_5" in variables["params"]


def test_mono_post_process_flip_averaging():
    predictor = load_weights(None, TINY_MONO, seed=0)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(64, 128, 3), dtype=np.uint8)
    plain = predict_mono(predictor, img)
    tta = predict_mono(predictor, img, post_process=True)
    assert tta["depth"].shape == plain["depth"].shape
    assert not np.allclose(tta["disp"], plain["disp"])
    # Mirrored input must give the mirrored TTA output (flip-equivariance
    # of the averaged estimate).
    tta_m = predict_mono(predictor, img[:, ::-1], post_process=True)
    np.testing.assert_allclose(
        tta_m["disp"], tta["disp"][:, ::-1], rtol=2e-4, atol=2e-5
    )


def test_memory_report_tiny():
    """Static HBM report (benchmark.run_memory_report) returns positive
    sizes for both the serving program and a train step."""
    from scenedepthestimation_tpu import benchmark

    cfg = RunConfig(
        name="tiny_memrep",
        pipeline="mono",
        batch_size=2,
        mono=MonoConfig(height=64, width=128),
    )
    rep = benchmark.run_memory_report(cfg)
    assert rep["unit"] == "MB"
    assert rep["value"] > 0 and rep["argument_mb"] > 0
    assert rep["batch_size"] == 2

    rep_t = benchmark.run_memory_report(cfg, train_mode="supervised")
    assert rep_t["value"] > 0
    # Train step carries params + Adam moments + activations: peak must
    # exceed the serving program's.
    assert rep_t["value"] >= rep["value"]
