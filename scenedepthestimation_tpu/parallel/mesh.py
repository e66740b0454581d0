"""Device mesh + data-parallel sharding (SURVEY §2 parallelism table,
§3.4, §5.8).

The TPU-native distributed story: no explicit comm backend — a 1-D
``jax.sharding.Mesh`` over the chips with ``NamedSharding`` annotations on
the batch axis; GSPMD under ``jax.jit`` compiles whatever collectives are
needed onto ICI. The judged config-5 forward is pure data parallel, so
the compiled program must contain ZERO collectives — asserted in
tests/test_sharding.py by HLO inspection (SURVEY §5.8).
"""

from __future__ import annotations

from typing import Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"need {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), axis_names=(DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a host batch onto the mesh, sharded along axis 0."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate_variables(variables, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.device_put(variables, sharding)


def batch_inference(predictor, images: Iterable, mesh: Optional[Mesh] = None) -> List:
    """Run batched prediction over an iterable of pre-decoded frames.

    With a mesh, weights are replicated and each batch is sharded on the
    batch axis before the jitted program runs (SPMD over chips). The
    pipelined double-buffered feed (config 5) lives in parallel/feed.py
    and supersedes this simple loop for throughput runs.
    """
    results = []
    variables = predictor.variables
    if mesh is not None:
        variables = replicate_variables(variables, mesh)
    for batch in images:
        if predictor.cfg.pipeline == "stereo":
            left, right = batch
            left, right = jnp.asarray(left), jnp.asarray(right)
            if mesh is not None:
                left, right = shard_batch(left, mesh), shard_batch(right, mesh)
            program = predictor._stereo_program(tuple(left.shape), str(left.dtype))
            results.append(program(variables, left, right))
        else:
            imgs = jnp.asarray(batch)
            if mesh is not None:
                imgs = shard_batch(imgs, mesh)
            program = predictor._mono_program(tuple(imgs.shape), str(imgs.dtype))
            results.append(program(variables, imgs))
    return [
        {k: np.asarray(v) for k, v in r.items()} for r in results
    ]
