"""`.pth` EXPORT (utils/torch_export; SURVEY C16, VERDICT r4
missing-#2): a model trained here hands back to the reference
ecosystem as the family's ``encoder.pth``/``depth.pth``(/pose) files.

Proofs: export → torch_import round-trips bit-exactly (mono and the
joint temporal state), and the torch re-derivation
(tools/torch_ref.py) forward on EXPORTED weights matches our forward.
"""

import pathlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

from scenedepthestimation_tpu.configs import MonoConfig, RunConfig  # noqa: E402
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet  # noqa: E402
from scenedepthestimation_tpu.utils import torch_export, torch_import  # noqa: E402


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _assert_trees_bitequal(a, b):
    fa, fb = _flat(a), _flat(b)
    assert sorted(fa) == sorted(fb), (
        f"paths differ: only-in-a={sorted(set(fa) - set(fb))[:5]} "
        f"only-in-b={sorted(set(fb) - set(fa))[:5]}"
    )
    for path in fa:
        np.testing.assert_array_equal(fa[path], fb[path], err_msg=str(path))


def _mono_variables(h=32, w=64, seed=0):
    model = MonoDepthNet(cfg=MonoConfig(height=h, width=w))
    v = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 3)))
    return jax.tree_util.tree_map(np.asarray, dict(v))


def test_mono_export_roundtrip_bitexact(tmp_path):
    v = _mono_variables()
    written = torch_export.export_torch_dir(
        v, str(tmp_path), height=32, width=64
    )
    assert set(written) == {"encoder", "depth"}
    back = torch_import.load_torch_dir(str(tmp_path))
    _assert_trees_bitequal(v["params"], back["params"])
    _assert_trees_bitequal(v["batch_stats"], back["batch_stats"])


def test_temporal_export_roundtrip_bitexact(tmp_path):
    """The joint depth+pose training state exports as the family's
    4-file layout and survives the round trip bit-exactly."""
    from scenedepthestimation_tpu import train

    cfg = RunConfig(
        name="t_exp", pipeline="mono", batch_size=1,
        mono=MonoConfig(height=32, width=64),
    )
    state = train.make_temporal_train_state(cfg, seed=0)
    variables = jax.tree_util.tree_map(
        np.asarray,
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    written = torch_export.export_torch_dir(variables, str(tmp_path))
    assert set(written) == {"encoder", "depth", "pose_encoder", "pose"}
    back = torch_import.temporal_variables_from_dir(str(tmp_path))
    _assert_trees_bitequal(variables["params"], back["params"])
    _assert_trees_bitequal(variables["batch_stats"], back["batch_stats"])


def test_exported_weights_match_torch_forward(tmp_path):
    """The strongest available parity check (VERDICT r4 missing-#2):
    the torch re-derivation forward on weights EXPORTED from a flax
    model matches our flax forward at import-parity tolerance."""
    import torch
    import torch_ref

    v = _mono_variables(h=64, w=128, seed=3)
    torch_export.export_torch_dir(v, str(tmp_path), height=64, width=128)

    enc = torch.load(
        str(tmp_path / "encoder.pth"), map_location="cpu", weights_only=True
    )
    dec = torch.load(
        str(tmp_path / "depth.pth"), map_location="cpu", weights_only=True
    )
    # Rebuild torch_ref's attribute naming from the family's ModuleList
    # serialization (the inverse of torch_import._canonical_path):
    # decoder.N.conv.conv → upconv_i_j.conv, decoder.(10+s).conv →
    # dispconv_s.conv.
    order = torch_import._MD2_DECODER_ORDER
    state = {}
    for k, val in enc.items():
        if not hasattr(val, "ndim"):
            continue  # height/width/use_stereo bookkeeping ints
        state[k] = val  # torch_ref.MonoDepthNet nests encoder.*
    for k, val in dec.items():
        parts = k.split(".")
        assert parts[0] == "decoder" and parts[1].isdigit(), k
        name = order[int(parts[1])]
        rest = parts[2:]
        if name.startswith("upconv"):
            assert rest[:2] == ["conv", "conv"], k
            rest = rest[1:]
        state[".".join(["decoder", name] + rest)] = val
    tmodel = torch_ref.MonoDepthNet().eval()
    missing, unexpected = tmodel.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    # only num_batches_tracked counters may be absent
    assert all("num_batches_tracked" in m for m in missing), missing

    x = np.random.default_rng(1).normal(size=(1, 64, 128, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jmodel = MonoDepthNet(cfg=MonoConfig(height=64, width=128))
    jout = jmodel.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        jnp.asarray(x),
    )
    for s in (0, 1, 2, 3):
        np.testing.assert_allclose(
            np.asarray(jout[s]),
            tout[s].numpy().transpose(0, 2, 3, 1),
            atol=2e-6,
            rtol=1e-5,
        )


def test_export_rejects_unknown_decoder_module():
    with pytest.raises(ValueError, match="no family serialization"):
        torch_export.decoder_state_dict({"mystery": {"kernel": np.zeros((3, 3, 1, 1))}})


def test_cli_export_torch(tmp_path):
    """`scenedepth export --torch DIR`: orbax predict artifact →
    family .pth dir; weights re-import through the normal --weights
    path bit-identically."""
    from scenedepthestimation_tpu.cli import main
    from scenedepthestimation_tpu.utils import checkpoint

    v = _mono_variables()
    art = str(tmp_path / "weights")
    checkpoint.save_variables(art, v)
    out = str(tmp_path / "torch_out")
    rc = main(
        [
            "export", "--weights", art, "--torch", out,
            "--config", "mono_kitti_192x640_fp32",
        ]
    )
    assert rc == 0
    back = checkpoint.load_variables(out)
    _assert_trees_bitequal(v["params"], back["params"])
    _assert_trees_bitequal(v["batch_stats"], back["batch_stats"])


def test_stereo_export_roundtrip_and_torch_forward(tmp_path):
    """Stereo nets export as one whole-model stereo.pth in the
    pass-through naming the torch re-derivation loads directly:
    round-trip bit-exact AND torch forward on exported weights matches
    our forward at import-parity tolerance."""
    import torch
    import torch_ref

    from scenedepthestimation_tpu.configs import StereoConfig
    from scenedepthestimation_tpu.models.stereo import StereoNet

    cfg = StereoConfig(height=64, width=128, max_disp=32, feat_channels=32)
    model = StereoNet(cfg=cfg)
    z = jnp.zeros((1, 64, 128, 3))
    v = jax.tree_util.tree_map(
        np.asarray, dict(model.init(jax.random.PRNGKey(2), z, z))
    )
    written = torch_export.export_torch_dir(v, str(tmp_path))
    assert set(written) == {"stereo"}

    back = torch_import.load_torch_file(str(tmp_path / "stereo.pth"))
    _assert_trees_bitequal(v["params"], back["params"])

    tmodel = torch_ref.StereoNet(max_disp=32, feat_channels=32).eval()
    state = torch.load(
        str(tmp_path / "stereo.pth"), map_location="cpu", weights_only=True
    )
    missing, unexpected = tmodel.load_state_dict(state, strict=False)
    assert not unexpected, unexpected
    assert all("num_batches_tracked" in m for m in missing), missing

    rng = np.random.default_rng(4)
    left = rng.normal(size=(1, 64, 128, 3)).astype(np.float32)
    right = rng.normal(size=(1, 64, 128, 3)).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(
            torch.from_numpy(left.transpose(0, 3, 1, 2)),
            torch.from_numpy(right.transpose(0, 3, 1, 2)),
        ).numpy()
    jout = np.asarray(
        model.apply(
            {"params": v["params"]}, jnp.asarray(left), jnp.asarray(right)
        )
    )
    np.testing.assert_allclose(jout, tout, atol=1e-4, rtol=1e-5)


def test_cli_export_torch_temporal_pose_rides_along(tmp_path):
    """`scenedepth export --torch` detects a sibling {weights}_pose
    artifact (temporal training's save_predict_artifact layout) and
    writes the full 4-file family layout."""
    from scenedepthestimation_tpu import train
    from scenedepthestimation_tpu.cli import main

    cfg = RunConfig(
        name="t_cli_exp", pipeline="mono", batch_size=1,
        mono=MonoConfig(height=32, width=64),
    )
    state = train.make_temporal_train_state(cfg, seed=0)
    art = str(tmp_path / "final")
    train.save_predict_artifact(state, art)  # writes final + final_pose
    out = str(tmp_path / "torch_out")
    rc = main(
        ["export", "--weights", art, "--torch", out,
         "--config", "mono_kitti_192x640_fp32"]
    )
    assert rc == 0
    import os

    assert sorted(os.listdir(out)) == [
        "depth.pth", "encoder.pth", "pose.pth", "pose_encoder.pth"
    ]
    back = torch_import.temporal_variables_from_dir(out)
    want = jax.tree_util.tree_map(
        np.asarray, {"params": state.params, "batch_stats": state.batch_stats}
    )
    _assert_trees_bitequal(want["params"], back["params"])
