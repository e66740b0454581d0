"""Checkpoint save/load (SURVEY C16) — Orbax for native checkpoints.

"Load weights" is half the reference's public API (BASELINE.json:5). Two
formats are accepted by :func:`load_variables`:

* an Orbax checkpoint directory written by :func:`save_variables`;
* a PyTorch ``.pth``/``.pt`` state-dict file or a directory of per-network
  state dicts (``encoder.pth`` + ``depth.pth`` reference-family layout),
  converted through utils/torch_import.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    """Write a {'params': ..., 'batch_stats': ...} pytree with Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(variables))
    ckptr.wait_until_finished()


def save_pytree(path: str, tree: Any, force: bool = False) -> None:
    """Write an arbitrary pytree (e.g. a full TrainState snapshot incl.
    optax opt_state) with Orbax. ``force=True`` overwrites an existing
    checkpoint directory (resumed runs re-save ``final``)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(tree), force=force)
    ckptr.wait_until_finished()


def restore_pytree(path: str, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_pytree` INTO the structure
    of ``target`` — the target's container types (optax NamedTuples,
    nested dicts) and leaf dtypes are preserved, which a target-less
    restore cannot do (it returns plain nested dicts)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def load_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def load_variables(path: str, pipeline: str = "mono") -> Dict[str, Any]:
    """Dispatch on checkpoint format. Returns flax variables pytree."""
    from scenedepthestimation_tpu.utils import torch_import

    if os.path.isdir(path):
        entries = os.listdir(path)
        if any(e.endswith((".pth", ".pt")) for e in entries):
            return torch_import.load_torch_dir(path, pipeline=pipeline)
        return load_orbax(path)
    if path.endswith((".pth", ".pt")):
        return torch_import.load_torch_file(path, pipeline=pipeline)
    raise ValueError(f"unrecognized checkpoint path {path!r}")
