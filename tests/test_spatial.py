"""Spatial-H sharding tests (SURVEY §5.7): equality + real halo exchange."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from scenedepthestimation_tpu.api import build_mono_program, load_weights
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig
from scenedepthestimation_tpu.parallel.mesh import make_mesh
from scenedepthestimation_tpu.parallel.spatial import (
    mono_forward_spatial,
    shard_spatial,
    spatial_sharding,
)

# H = 8 devices * 32 stride = 256 minimum.
TINY = RunConfig(
    name="tiny_spatial", pipeline="mono", mono=MonoConfig(height=256, width=64)
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_spatial_matches_unsharded(mesh):
    predictor = load_weights(None, TINY, seed=0)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (1, 256, 64, 3), dtype=np.uint8))

    want = predictor.mono_forward(img)
    got = mono_forward_spatial(
        TINY, predictor.model, predictor.variables, img, mesh
    )
    np.testing.assert_allclose(
        np.asarray(got["depth"]), np.asarray(want["depth"]), rtol=2e-5, atol=2e-5
    )


def test_spatial_hlo_has_halo_exchange(mesh):
    """The sharding must be real: halo exchanges present, no full gather
    of the input-sized activations."""
    predictor = load_weights(None, TINY, seed=0)
    program = build_mono_program(TINY, predictor.model)
    img = jnp.zeros((1, 256, 64, 3), jnp.uint8)
    lowered = jax.jit(
        program,
        in_shardings=(NamedSharding(mesh, P()), spatial_sharding(mesh)),
    ).lower(predictor.variables, shard_spatial(img, mesh))
    hlo = lowered.compile().as_text()
    assert "collective-permute" in hlo  # boundary-row halo exchange


def test_spatial_rejects_indivisible_height(mesh):
    predictor = load_weights(None, TINY, seed=0)
    img = jnp.zeros((1, 96, 64, 3), jnp.uint8)
    with pytest.raises(ValueError, match="divisible"):
        mono_forward_spatial(TINY, predictor.model, predictor.variables, img, mesh)


def test_stereo_spatial_matches_unsharded(mesh):
    """H-sharded stereo forward — exercises GSPMD conv halos AND the
    Pallas correlation custom_partitioning under spatial sharding."""
    from scenedepthestimation_tpu.configs import StereoConfig
    from scenedepthestimation_tpu.parallel.spatial import stereo_forward_spatial
    import scenedepthestimation_tpu.ops.correlation as corr

    cfg = RunConfig(
        name="tiny_spatial_stereo", pipeline="stereo",
        stereo=StereoConfig(height=256, width=64, max_disp=16, feat_channels=16),
    )
    predictor = load_weights(None, cfg, seed=0)
    rng = np.random.default_rng(1)
    left = jnp.asarray(rng.integers(0, 256, (1, 256, 64, 3), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, (1, 256, 64, 3), dtype=np.uint8))

    want = predictor.stereo_forward(left, right)
    # Force the pallas path (auto-interprets on the CPU mesh) so the
    # custom_partitioning is what's under test, not the jnp fallback.
    orig = corr._USE_PALLAS
    corr.set_use_pallas(True)
    try:
        got = stereo_forward_spatial(
            cfg, predictor.model, predictor.variables, left, right, mesh
        )
    finally:
        corr.set_use_pallas(orig)
    np.testing.assert_allclose(
        np.asarray(got["disp"]), np.asarray(want["disp"]), rtol=2e-4, atol=2e-4
    )
