"""torch .pth import coverage (SURVEY C16; VERDICT r1 missing #4/#8).

Proves the import chain a reference user would exercise, as far as an
offline box allows:

* a torchvision-layout ``resnet18-imagenet.pth`` (incl. the ``fc`` head
  and ``num_batches_tracked`` entries a real ImageNet checkpoint has,
  values from a fixed RNG since the real weights are unreachable
  offline) round-trips through ``load_torch_dir`` and yields
  encoder-feature parity vs tools/torch_ref.py;
* a monodepth2-family ``depth.pth`` whose DepthDecoder serialized
  through ``nn.ModuleList`` (numeric keys ``decoder.N.conv.conv.weight``)
  maps onto our named Flax modules (ADVICE r1);
* the reference family's non-tensor bookkeeping inside ``encoder.pth``
  ('height'/'width'/'use_stereo') is stripped on both the dir and the
  single-file path (ADVICE r1).
"""

import pathlib
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

import torch  # noqa: E402
import torch_ref  # noqa: E402

from scenedepthestimation_tpu.api import load_weights  # noqa: E402
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig  # noqa: E402
from scenedepthestimation_tpu.utils.torch_import import (  # noqa: E402
    convert_state_dict,
    load_torch_file,
)

TINY = RunConfig(
    name="tiny_import", pipeline="mono", mono=MonoConfig(height=64, width=128)
)

# monodepth2 ModuleList serialization order (deterministic OrderedDict
# build order: upconv_{4..0}_{0,1} then dispconv_{0..3}).
_MD2_ORDER = [f"upconv_{i}_{j}" for i in range(4, -1, -1) for j in (0, 1)] + [
    f"dispconv_{s}" for s in range(4)
]


def _as_md2_modulelist(dec_state):
    """Rename torch_ref's named decoder keys into the monodepth2
    ModuleList layout: ConvBlock nests Conv3x3 (``N.conv.conv.*``),
    DispHead is a bare Conv3x3 (``N.conv.*``)."""
    out = {}
    for key, value in dec_state.items():
        name, rest = key.split(".", 1)  # e.g. upconv_4_0, conv.weight
        idx = _MD2_ORDER.index(name)
        if name.startswith("upconv"):
            rest = "conv." + rest  # conv.weight -> conv.conv.weight
        out[f"decoder.{idx}.{rest}"] = value
    return out


def test_md2_modulelist_decoder_numeric_keys():
    """Numeric ModuleList keys convert to the identical params tree as
    the named layout."""
    torch.manual_seed(3)
    tdec = torch_ref.DepthDecoder()
    named = convert_state_dict(tdec.state_dict())
    numeric = convert_state_dict(_as_md2_modulelist(tdec.state_dict()))
    assert named.keys() == numeric.keys()
    flat_n, flat_m = {}, {}

    def _flatten(tree, prefix, into):
        for k, v in tree.items():
            if isinstance(v, dict):
                _flatten(v, prefix + (k,), into)
            else:
                into[prefix + (k,)] = v

    _flatten(named["params"], (), flat_n)
    _flatten(numeric["params"], (), flat_m)
    assert flat_n.keys() == flat_m.keys()
    for k in flat_n:
        np.testing.assert_array_equal(flat_n[k], flat_m[k])


def test_md2_checkpoint_dir_through_api(tmp_path):
    """Full monodepth2-format checkpoint dir: encoder.pth with the
    family's bookkeeping entries + depth.pth in ModuleList layout, loaded
    through the public load_weights surface, forward parity vs torch."""
    torch.manual_seed(4)
    tmodel = torch_ref.MonoDepthNet().eval()
    enc_state = dict(tmodel.encoder.state_dict())
    # monodepth2 stores these inside encoder.pth.
    enc_state["height"] = 64
    enc_state["width"] = 128
    enc_state["use_stereo"] = False
    torch.save(enc_state, str(tmp_path / "encoder.pth"))
    torch.save(
        _as_md2_modulelist(tmodel.decoder.state_dict()),
        str(tmp_path / "depth.pth"),
    )

    predictor = load_weights(str(tmp_path), TINY)
    x = np.random.default_rng(5).normal(size=(1, 64, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy()
    got = np.asarray(predictor.model.apply(predictor.variables, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-6)


def test_md2_wrapped_encoder_keys(tmp_path):
    """REAL monodepth2 encoder.pth keys are ``encoder.conv1.weight`` —
    its ResnetEncoder wraps torchvision as ``self.encoder`` — so the
    directory loader must not double-nest (r2 review finding). Also
    covers the DataParallel ``module.`` prefix."""
    torch.manual_seed(7)
    tmodel = torch_ref.MonoDepthNet().eval()
    enc_state = {
        f"encoder.{k}": v for k, v in tmodel.encoder.state_dict().items()
    }
    enc_state["height"] = 64
    enc_state["width"] = 128
    enc_state["use_stereo"] = False
    torch.save(enc_state, str(tmp_path / "encoder.pth"))
    torch.save(
        {
            f"module.{k}": v
            for k, v in _as_md2_modulelist(tmodel.decoder.state_dict()).items()
        },
        str(tmp_path / "depth.pth"),
    )

    predictor = load_weights(str(tmp_path), TINY)
    x = np.random.default_rng(8).normal(size=(1, 64, 128, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0].numpy()
    got = np.asarray(predictor.model.apply(predictor.variables, jnp.asarray(x))[0])
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1), atol=2e-6)


def test_torchvision_imagenet_layout_roundtrip(tmp_path):
    """ImageNet-init workflow proof (SURVEY C6): a state dict with the
    exact torchvision resnet18 key set — including the ``fc`` head our
    encoder doesn't use — imports and gives encoder-feature parity."""
    torch.manual_seed(6)
    tenc = torch_ref.ResNetEncoder().eval()
    state = dict(tenc.state_dict())
    # Real torchvision checkpoints carry the classifier head; the import
    # must tolerate it (converted params are simply unused by apply).
    state["fc.weight"] = torch.randn(1000, 512)
    state["fc.bias"] = torch.randn(1000)
    path = str(tmp_path / "resnet18-imagenet.pth")
    torch.save(state, path)

    variables = load_torch_file(path)
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    x = np.random.default_rng(7).normal(size=(2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        tfeats = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jfeats = ResNetEncoder(num_layers=18).apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
    )
    for lvl, (jf, tf) in enumerate(zip(jfeats, tfeats)):
        np.testing.assert_allclose(
            np.asarray(jf),
            tf.numpy().transpose(0, 2, 3, 1),
            atol=2e-6,
            rtol=1e-5,
            err_msg=f"encoder level {lvl}",
        )


def test_load_torch_file_strips_bookkeeping(tmp_path):
    """Single-file import of an encoder.pth with height/width/use_stereo
    must not raise (ADVICE r1 low)."""
    torch.manual_seed(8)
    tenc = torch_ref.ResNetEncoder().eval()
    state = dict(tenc.state_dict())
    state["height"] = 192
    state["width"] = 640
    state["use_stereo"] = False
    path = str(tmp_path / "encoder.pth")
    torch.save(state, path)
    variables = load_torch_file(path)
    assert "conv1" in variables["params"]
    assert "height" not in variables["params"]


def _save_md2_pose_dir(tmp_path, tpose):
    """Save a PoseNetTorch in the monodepth2 on-disk layout:
    pose_encoder.pth with wrapped ``encoder.*`` keys, pose.pth with the
    PoseDecoder's ModuleList ``net.N.*`` keys."""
    enc_state = {
        f"encoder.{k}": v for k, v in tpose.encoder.state_dict().items()
    }
    torch.save(enc_state, str(tmp_path / "pose_encoder.pth"))
    order = ["squeeze", "pose_0", "pose_1", "pose_2"]
    dec_state = {}
    for i, name in enumerate(order):
        for k, v in getattr(tpose, name).state_dict().items():
            dec_state[f"net.{i}.{k}"] = v
    torch.save(dec_state, str(tmp_path / "pose.pth"))


def test_posenet_dir_import_parity(tmp_path):
    """The pose pair of a reference-family weight dir imports into our
    Flax PoseNet with forward parity — including the family's
    12-channel (2-frame) pose head, sliced to the used first 6."""
    import jax

    from scenedepthestimation_tpu.models.posenet import PoseNet
    from scenedepthestimation_tpu.utils.torch_import import (
        temporal_variables_from_dir,
    )

    torch.manual_seed(11)
    tpose = torch_ref.PoseNetTorch(num_frames_to_predict_for=2).eval()
    # Randomize BN running stats so eval-mode parity actually covers them.
    with torch.no_grad():
        for m in tpose.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)
    _save_md2_pose_dir(tmp_path, tpose)

    variables = temporal_variables_from_dir(str(tmp_path))
    pose_vars = {
        "params": variables["params"]["pose"],
        "batch_stats": variables["batch_stats"]["pose"],
    }
    # Head sliced 12 -> 6.
    assert pose_vars["params"]["decoder"]["pose_2"]["kernel"].shape[-1] == 6

    model = PoseNet()
    rng = np.random.default_rng(12)
    pair = rng.normal(size=(2, 64, 128, 6)).astype(np.float32)
    aa, tr = model.apply(pose_vars, jnp.asarray(pair), train=False)
    with torch.no_grad():
        want_aa, want_tr = tpose(torch.from_numpy(pair.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(aa), want_aa.numpy(), atol=2e-6)
    np.testing.assert_allclose(np.asarray(tr), want_tr.numpy(), atol=2e-6)
    # The imported tree drops into the temporal TrainState slot unchanged.
    from scenedepthestimation_tpu import train
    from scenedepthestimation_tpu.configs import MonoConfig, RunConfig

    cfg = RunConfig(
        name="t_pose_import", pipeline="mono", batch_size=2,
        mono=MonoConfig(height=64, width=128),
    )
    state = train.make_temporal_train_state(cfg, seed=0)
    want_tree = jax.tree.structure(state.params["pose"])
    got_tree = jax.tree.structure(variables["params"]["pose"])
    assert want_tree == got_tree


def test_pose_files_do_not_clobber_depth_encoder(tmp_path):
    """A full reference weight dir carries BOTH encoder.pth (depth, 3-ch
    conv1) and pose_encoder.pth (6-ch conv1) — the pose encoder must nest
    under pose/, not overwrite the depth encoder at the root."""
    from scenedepthestimation_tpu.utils.torch_import import load_torch_dir

    torch.manual_seed(13)
    tmodel = torch_ref.MonoDepthNet().eval()
    enc_state = {
        f"encoder.{k}": v for k, v in tmodel.encoder.state_dict().items()
    }
    torch.save(enc_state, str(tmp_path / "encoder.pth"))
    torch.save(
        _as_md2_modulelist(tmodel.decoder.state_dict()),
        str(tmp_path / "depth.pth"),
    )
    tpose = torch_ref.PoseNetTorch().eval()
    _save_md2_pose_dir(tmp_path, tpose)

    variables = load_torch_dir(str(tmp_path))
    depth_conv1 = variables["params"]["encoder"]["conv1"]["kernel"]
    pose_conv1 = variables["params"]["pose"]["encoder"]["conv1"]["kernel"]
    assert depth_conv1.shape[2] == 3  # depth encoder untouched
    assert pose_conv1.shape[2] == 6
    np.testing.assert_array_equal(
        depth_conv1,
        tmodel.encoder.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
    )
