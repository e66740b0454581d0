"""Spatial (H-axis) sharding — the conv-world analogue of sequence
parallelism (SURVEY §5.7).

When one frame exceeds per-chip HBM (giant panoramas, future model
scale), the batch axis stops being enough: this module shards the image
HEIGHT across the mesh instead. The TPU-native mechanism is GSPMD: we
only annotate the input with ``P(None, 'data', None, None)`` and jit —
XLA's SPMD partitioner inserts the halo exchanges (collective-permutes
of boundary rows between neighbouring chips) that every conv / pool /
resize window needs at shard edges. No manual ppermute ring is required
for correctness; Pallas-level manual halos (pallas_guide §Ring
Collectives) remain an optimization avenue.

tests/test_spatial.py asserts (a) numeric equality with the unsharded
forward and (b) that the compiled HLO really contains halo-exchange
collectives — i.e. the sharding is real, not a silent full-gather.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scenedepthestimation_tpu.api import build_mono_program
from scenedepthestimation_tpu.configs import RunConfig
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 1 (height) of a (B, H, W, C) image over the mesh."""
    return NamedSharding(mesh, P(None, "data"))


def shard_spatial(img: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    return jax.device_put(img, spatial_sharding(mesh))


def mono_forward_spatial(
    cfg: RunConfig, model: MonoDepthNet, variables, img: jnp.ndarray, mesh: Mesh
) -> Dict[str, jnp.ndarray]:
    """End-to-end mono program with the frame sharded along H.

    ``img`` (B, H, W, 3) uint8 with H divisible by (mesh size × 32) — the
    encoder's /32 stride must divide each shard evenly or GSPMD falls
    back to gathers.
    """
    n = mesh.devices.size
    if img.shape[1] % (n * 32) != 0:
        raise ValueError(
            f"H={img.shape[1]} must be divisible by mesh*stride = {n * 32}"
        )
    program = build_mono_program(cfg, model)
    sharded = jax.jit(
        program,
        in_shardings=(
            NamedSharding(mesh, P()),  # weights replicated
            spatial_sharding(mesh),  # H sharded
        ),
    )
    return sharded(variables, shard_spatial(img, mesh))


def stereo_forward_spatial(
    cfg: RunConfig, model, variables, left: jnp.ndarray, right: jnp.ndarray,
    mesh: Mesh,
) -> Dict[str, jnp.ndarray]:
    """End-to-end stereo program with both frames sharded along H.

    Works because every op in the stereo stack is row-parallel along H:
    convs/pools get GSPMD halo exchanges, and the Pallas correlation op's
    custom_partitioning declares H a shared (local) factor — its shifts
    run along W, which stays intact per shard.
    """
    from scenedepthestimation_tpu.api import build_stereo_program

    n = mesh.devices.size
    if left.shape[1] % (n * 32) != 0:
        raise ValueError(
            f"H={left.shape[1]} must be divisible by mesh*stride = {n * 32}"
        )
    program = build_stereo_program(cfg, model)
    sharded = jax.jit(
        program,
        in_shardings=(
            NamedSharding(mesh, P()),
            spatial_sharding(mesh),
            spatial_sharding(mesh),
        ),
    )
    return sharded(
        variables, shard_spatial(left, mesh), shard_spatial(right, mesh)
    )
