"""Serving export (production-deployment path): serialize the full
end-to-end inference program — weights baked in as constants — to a
portable StableHLO artifact via ``jax.export``, reloadable in a process
with no model code, no checkpoint, and no Python beyond jax.

This is the TPU-native analogue of the reference family's
"ship a .pth + model code" deployment: one self-contained artifact per
(config, batch size), loadable by ``load_exported`` and callable with a
uint8 frame batch.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from scenedepthestimation_tpu.api import (
    Predictor,
    build_mono_program,
    build_stereo_program,
)

_MANIFEST = "manifest.json"
_ARTIFACT = "program.stablehlo"


def export_predictor(
    predictor: Predictor,
    path: str,
    batch_size: int = 1,
    input_hw: Optional[Tuple[int, int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> str:
    """Serialize predictor's end-to-end program (weights baked) to
    ``path`` (a directory). Returns the artifact path.

    ``input_hw`` defaults to the config's network resolution; pass the
    source resolution to bake the resize in. ``platforms`` defaults to
    the current backend (e.g. ['tpu']); pass ['cpu','tpu'] for a
    multi-platform artifact.
    """
    cfg = predictor.cfg
    hw = input_hw or (cfg.height, cfg.width)
    variables = predictor.variables

    if cfg.pipeline == "mono":
        program = build_mono_program(cfg, predictor.model)

        def fn(img):
            return program(variables, img)

        args = (jax.ShapeDtypeStruct((batch_size, *hw, 3), jnp.uint8),)
    else:
        program = build_stereo_program(cfg, predictor.model)

        def fn(left, right):
            return program(variables, left, right)

        spec = jax.ShapeDtypeStruct((batch_size, *hw, 3), jnp.uint8)
        args = (spec, spec)

    exported = jax_export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(*args)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _ARTIFACT), "wb") as f:
        f.write(exported.serialize())
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(
            {
                "pipeline": cfg.pipeline,
                "config": cfg.name,
                "batch_size": batch_size,
                "input_hw": list(hw),
                "platforms": list(exported.platforms),
                "outputs": ["disp", "depth"],
            },
            f,
            indent=2,
        )
    return os.path.join(path, _ARTIFACT)


def load_exported(path: str) -> Tuple[Callable, dict]:
    """Load a serving artifact → (callable, manifest).

    The callable takes uint8 frame batch(es) exactly as exported and
    returns {'disp', 'depth'} numpy arrays; it re-jits the deserialized
    program so repeated calls hit the executable cache.
    """
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    with open(os.path.join(path, _ARTIFACT), "rb") as f:
        exported = jax_export.deserialize(f.read())

    call = jax.jit(exported.call)

    def serve(*frames):
        out = call(*[jnp.asarray(x) for x in frames])
        return {k: np.asarray(v) for k, v in out.items()}

    return serve, manifest
