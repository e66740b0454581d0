"""Golden-output parity tests (SURVEY §4.1, §4.3).

PROVENANCE: the reference mount was empty (SURVEY.md §Provenance), so
parity is checked against the committed torch-CPU re-derivation of the
same architecture (tools/torch_ref.py), run LIVE in the test — weights
are initialized in torch, converted through utils/torch_import (the same
code path that would ingest real reference .pth files), and the forward
outputs compared elementwise. This substitution is recorded in
PROGRESS.jsonl per SURVEY §Provenance step 2.
"""

import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torch_ref  # noqa: E402
from scenedepthestimation_tpu.configs import MonoConfig, StereoConfig  # noqa: E402
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet  # noqa: E402
from scenedepthestimation_tpu.models.stereo import StereoNet  # noqa: E402
from scenedepthestimation_tpu.utils.torch_import import convert_state_dict  # noqa: E402


def _rand_image(shape, seed):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, size=shape).astype(np.float32)


def test_mono_forward_parity():
    """Flax mono net == torch re-derivation with imported weights, fp32."""
    torch.manual_seed(0)
    tmodel = torch_ref.MonoDepthNet().eval()
    variables = convert_state_dict(tmodel.state_dict())

    x = _rand_image((1, 64, 128, 3), seed=1)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    jmodel = MonoDepthNet(cfg=MonoConfig(height=64, width=128))
    jout = jmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    for s in (0, 1, 2, 3):
        ref = tout[s].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(jout[s])
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=1e-5)


def test_stereo_forward_parity():
    torch.manual_seed(0)
    tmodel = torch_ref.StereoNet(max_disp=32, feat_channels=32).eval()
    variables = convert_state_dict(tmodel.state_dict())

    left = _rand_image((1, 64, 128, 3), seed=2)
    right = _rand_image((1, 64, 128, 3), seed=3)
    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(left.transpose(0, 3, 1, 2)),
            torch.from_numpy(right.transpose(0, 3, 1, 2)),
        ).numpy()

    cfg = StereoConfig(height=64, width=128, max_disp=32, feat_channels=32)
    jmodel = StereoNet(cfg=cfg)
    jout = np.asarray(
        jmodel.apply({"params": variables["params"]}, jnp.asarray(left), jnp.asarray(right))
    )
    # Disparity is an expectation over a softmax — absolute scale ~ max_disp.
    np.testing.assert_allclose(jout, tout, atol=1e-4, rtol=1e-5)


def test_encoder_feature_parity():
    """Per-level check isolates where any drift enters (SURVEY §7)."""
    torch.manual_seed(1)
    tenc = torch_ref.ResNetEncoder().eval()
    variables = convert_state_dict(tenc.state_dict())

    x = _rand_image((2, 64, 96, 3), seed=4)
    with torch.no_grad():
        tfeats = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    jfeats = ResNetEncoder(num_layers=18).apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    assert len(jfeats) == len(tfeats) == 5
    for lvl, (jf, tf) in enumerate(zip(jfeats, tfeats)):
        np.testing.assert_allclose(
            np.asarray(jf),
            tf.numpy().transpose(0, 2, 3, 1),
            atol=2e-6,
            rtol=1e-5,
            err_msg=f"encoder level {lvl}",
        )


def test_correlation_parity():
    rng = np.random.default_rng(5)
    fl = rng.normal(size=(2, 8, 16, 12)).astype(np.float32)
    fr = rng.normal(size=(2, 8, 16, 12)).astype(np.float32)
    tout = torch_ref.correlation1d(
        torch.from_numpy(fl.transpose(0, 3, 1, 2)),
        torch.from_numpy(fr.transpose(0, 3, 1, 2)),
        max_disp=6,
    ).numpy().transpose(0, 2, 3, 1)

    from scenedepthestimation_tpu.ops.correlation import correlation1d

    jout = np.asarray(correlation1d(jnp.asarray(fl), jnp.asarray(fr), 6))
    np.testing.assert_allclose(jout, tout, atol=1e-6)


def test_soft_argmin_parity():
    rng = np.random.default_rng(6)
    cost = rng.normal(size=(2, 8, 16, 24)).astype(np.float32)
    tout = torch_ref.soft_argmin(
        torch.from_numpy(cost.transpose(0, 3, 1, 2))
    ).numpy()

    from scenedepthestimation_tpu.ops.soft_argmin import soft_argmin

    jout = np.asarray(soft_argmin(jnp.asarray(cost)))
    np.testing.assert_allclose(jout, tout, atol=1e-5)


def test_bilinear_upsample_parity():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 5, 9, 4)).astype(np.float32)
    tout = (
        torch_ref.bilinear2x(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    from scenedepthestimation_tpu.ops.upsample import upsample2x

    jout = np.asarray(upsample2x(jnp.asarray(x), mode="bilinear"))
    np.testing.assert_allclose(jout, tout, atol=1e-6)


def test_nearest_upsample_parity():
    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 3, 5, 4)).astype(np.float32)
    tout = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="nearest"
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    from scenedepthestimation_tpu.ops.upsample import upsample2x

    jout = np.asarray(upsample2x(jnp.asarray(x), mode="nearest"))
    np.testing.assert_allclose(jout, tout, atol=0)


def test_parity_abs_rel_within_budget():
    """The judged parity component (BASELINE.json:2): abs-rel delta vs
    the reference stand-in must be far inside the 1e-3 budget."""
    from scenedepthestimation_tpu.benchmark import parity_abs_rel

    delta = parity_abs_rel("float32")
    assert delta is not None and delta < 1e-3, delta
