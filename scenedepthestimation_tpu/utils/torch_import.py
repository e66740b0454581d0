"""PyTorch state-dict → Flax variables converter (SURVEY C16).

The reference family saves per-network torch state dicts (``encoder.pth``
+ ``depth.pth``); this module ingests those (or a single combined file)
and produces the ``{'params': ..., 'batch_stats': ...}`` pytree our Flax
models consume. torch is only imported here — the rest of the framework
never depends on it.

Mapping rules (unit-tested against shape/value parity in
tests/test_checkpoint.py, tests/test_parity.py and
tests/test_torch_import.py):

* ``module.path.weight`` 4-D  → ``module/path: kernel`` transposed
  (O, I, kH, kW) → (kH, kW, I, O).
* ``weight`` 2-D → ``kernel`` transposed (O, I) → (I, O).
* BatchNorm ``weight``/``bias`` → ``scale``/``bias`` (params);
  ``running_mean``/``running_var`` → ``mean``/``var`` (batch_stats);
  ``num_batches_tracked`` is dropped.
* torchvision block indices ``layerN.B`` → our ``layerN_B``;
  ``downsample.0``/``downsample.1`` → ``downsample_conv``/``downsample_bn``.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping

import numpy as np

_BN_STATS = {"running_mean": "mean", "running_var": "var"}

# monodepth2-family DepthDecoder serializes its convs through
# ``nn.ModuleList(list(self.convs.values()))``; the OrderedDict build
# order is deterministic: upconv_{4..0}_{0,1} then dispconv_{scales}.
# Numeric keys like ``decoder.0.conv.conv.weight`` therefore map 1:1 to
# our Flax module names (ADVICE r1; unverifiable vs the empty mount but
# the family convention is fixed).
_MD2_DECODER_ORDER = tuple(
    f"upconv_{i}_{j}" for i in range(4, -1, -1) for j in (0, 1)
) + tuple(f"dispconv_{s}" for s in (0, 1, 2, 3))

# monodepth2-family PoseDecoder serializes through
# ``nn.ModuleList([squeeze, pose0, pose1, pose2])`` → ``net.N.*`` keys
# (UNVERIFIED vs the empty mount; family convention).
_MD2_POSE_ORDER = ("squeeze", "pose_0", "pose_1", "pose_2")


def _canonical_path(parts: list) -> list:
    """Apply torchvision→flax module-name rewrites."""
    # DataParallel-saved checkpoints prefix every key with ``module.``.
    if parts and parts[0] == "module":
        parts = parts[1:]
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == "downsample" and i + 1 < len(parts) and parts[i + 1] in ("0", "1"):
            out.append("downsample_conv" if parts[i + 1] == "0" else "downsample_bn")
            i += 2
            continue
        if re.fullmatch(r"layer\d+", p) and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
            continue
        if (
            p == "net"
            and i + 1 < len(parts)
            and parts[i + 1].isdigit()
            and int(parts[i + 1]) < len(_MD2_POSE_ORDER)
        ):
            out.append(_MD2_POSE_ORDER[int(parts[i + 1])])
            i += 2
            continue
        if (
            p == "decoder"
            and i + 1 < len(parts)
            and parts[i + 1].isdigit()
            and int(parts[i + 1]) < len(_MD2_DECODER_ORDER)
        ):
            name = _MD2_DECODER_ORDER[int(parts[i + 1])]
            out.append(name)
            i += 2
            # monodepth2 ConvBlock nests Conv3x3 (conv.conv); ours is one
            # module named ``conv``.
            if name.startswith("upconv") and parts[i : i + 2] == ["conv", "conv"]:
                out.append("conv")
                i += 2
            continue
        out.append(p)
        i += 1
    return out


def _set(tree: Dict[str, Any], path: list, leaf: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def convert_state_dict(
    state: Mapping[str, Any], prefix: Any = ""
) -> Dict[str, Any]:
    """Flat torch state dict → {'params': ..., 'batch_stats': ...}.

    ``prefix`` may be a str (one nesting level) or a tuple of levels
    (e.g. ``("pose", "encoder")`` for a pose_encoder.pth)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    bn_modules = {
        k.rsplit(".", 1)[0]
        for k in state
        if k.endswith(("running_mean", "running_var"))
    }

    for key, value in state.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        parts = key.split(".")
        pname = parts[-1]
        module = ".".join(parts[:-1])
        path = _canonical_path(parts[:-1])
        if prefix:
            nest = [prefix] if isinstance(prefix, str) else list(prefix)
            # monodepth2's ResnetEncoder wraps torchvision as
            # ``self.encoder``, so a real encoder.pth already carries the
            # ``encoder.`` component — only add that nesting level when
            # the keys don't carry it themselves (double-nesting broke
            # genuine reference checkpoint dirs; r2 review finding).
            if path[:1] == nest[-1:]:
                path = nest[:-1] + path
            else:
                path = nest + path

        if pname == "num_batches_tracked":
            continue
        if pname in _BN_STATS:
            _set(stats, path + [_BN_STATS[pname]], arr.astype(np.float32))
            continue
        if pname == "weight":
            if module in bn_modules:
                _set(params, path + ["scale"], arr.astype(np.float32))
            elif arr.ndim == 4:
                _set(params, path + ["kernel"], arr.transpose(2, 3, 1, 0).astype(np.float32))
            elif arr.ndim == 2:
                _set(params, path + ["kernel"], arr.transpose(1, 0).astype(np.float32))
            else:
                _set(params, path + ["scale"], arr.astype(np.float32))
            continue
        if pname == "bias":
            _set(params, path + ["bias"], arr.astype(np.float32))
            continue
        raise ValueError(f"unhandled torch parameter {key!r}")

    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _merge(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _strip_bookkeeping(state: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop the non-tensor entries the reference family stores alongside
    weights inside ``encoder.pth`` ('height'/'width'/'use_stereo')."""
    return {
        k: v
        for k, v in state.items()
        if hasattr(v, "ndim") and not isinstance(v, (int, float, str, bool))
    }


def load_torch_file(path: str, pipeline: str = "mono") -> Dict[str, Any]:
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return convert_state_dict(_strip_bookkeeping(state))


def load_torch_dir(path: str, pipeline: str = "mono") -> Dict[str, Any]:
    """Reference-family layout: per-network .pth files in one directory.

    ``encoder.pth`` nests under ``encoder``; ``depth.pth``/``decoder.pth``
    under ``decoder``; the pose pair nests under ``pose/...`` (a
    ``pose_encoder.pth`` also carries ``encoder.``-prefixed keys — nesting
    it at the root would CLOBBER the depth encoder); anything else is
    merged at the root.
    """
    import torch

    nest_by_stem = {
        "encoder": "encoder",
        "depth": "decoder",
        "decoder": "decoder",
        "pose_encoder": ("pose", "encoder"),
        "pose": ("pose", "decoder"),
        "pose_decoder": ("pose", "decoder"),
    }
    out: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    for entry in sorted(os.listdir(path)):
        if not entry.endswith((".pth", ".pt")):
            continue
        stem = os.path.splitext(entry)[0]
        state = torch.load(
            os.path.join(path, entry), map_location="cpu", weights_only=True
        )
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        converted = convert_state_dict(
            _strip_bookkeeping(state), prefix=nest_by_stem.get(stem, "")
        )
        _merge(out["params"], converted.get("params", {}))
        _merge(out["batch_stats"], converted.get("batch_stats", {}))
    _slice_pose_head(out["params"])
    if not out["batch_stats"]:
        out.pop("batch_stats")
    return out


def _slice_pose_head(params: Dict[str, Any]) -> None:
    """monodepth2-family PoseDecoders predict ``num_frames_to_predict_for
    = 2`` poses (12 output channels); only the first 6-vector is consumed
    (family convention; UNVERIFIED vs the empty mount). Our PoseNet
    predicts the used 6 directly — slice a 12-channel head down."""
    head = params.get("pose", {}).get("decoder", {}).get("pose_2")
    if not isinstance(head, dict):
        return
    kernel = head.get("kernel")
    if kernel is not None and kernel.shape[-1] % 6 == 0 and kernel.shape[-1] > 6:
        head["kernel"] = np.ascontiguousarray(kernel[..., :6])
        if head.get("bias") is not None:
            head["bias"] = np.ascontiguousarray(head["bias"][:6])


def temporal_variables_from_dir(path: str) -> Dict[str, Any]:
    """Reference-family weight dir → the ``{'depth': ..., 'pose': ...}``
    nesting ``train.make_temporal_train_state`` uses (depth nets at the
    root of the dir layout; pose pair under ``pose``)."""
    flat = load_torch_dir(path)

    def renest(tree: Dict[str, Any]) -> Dict[str, Any]:
        pose = tree.pop("pose", {})
        return {"depth": tree, "pose": pose}

    out = {"params": renest(flat.get("params", {}))}
    if "batch_stats" in flat:
        out["batch_stats"] = renest(flat["batch_stats"])
    return out
