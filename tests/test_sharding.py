"""8-way SPMD semantics on the virtual CPU mesh (SURVEY §4.4, §5.8)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from scenedepthestimation_tpu import configs, train
from scenedepthestimation_tpu.api import build_stereo_program, load_weights
from scenedepthestimation_tpu.configs import RunConfig, StereoConfig
from scenedepthestimation_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate_variables,
    shard_batch,
)

TINY = RunConfig(
    name="tiny_sharded",
    pipeline="stereo",
    batch_size=8,
    stereo=StereoConfig(height=32, width=64, max_disp=16, feat_channels=16),
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_forward_matches_single_device(mesh):
    """Same math sharded vs unsharded (DP must be semantics-neutral)."""
    predictor = load_weights(None, TINY, seed=0)
    rng = np.random.default_rng(0)
    left = rng.integers(0, 256, (8, 32, 64, 3), dtype=np.uint8)
    right = rng.integers(0, 256, (8, 32, 64, 3), dtype=np.uint8)

    single = predictor.stereo_forward(jnp.asarray(left), jnp.asarray(right))

    variables = replicate_variables(predictor.variables, mesh)
    ls = shard_batch(jnp.asarray(left), mesh)
    rs = shard_batch(jnp.asarray(right), mesh)
    program = jax.jit(build_stereo_program(TINY, predictor.model))
    sharded = program(variables, ls, rs)

    np.testing.assert_allclose(
        np.asarray(sharded["disp"]), np.asarray(single["disp"]), atol=1e-5
    )
    # Output stayed sharded on the batch axis — no implicit gather.
    assert sharded["disp"].sharding.spec == P("data")


def test_forward_compiles_with_zero_collectives(mesh):
    """Config-5 forward is pure DP: the compiled HLO must contain NO
    cross-chip collectives (SURVEY §5.8 assertion)."""
    predictor = load_weights(None, TINY, seed=0)
    variables = replicate_variables(predictor.variables, mesh)
    left = shard_batch(jnp.zeros((8, 32, 64, 3), jnp.uint8), mesh)
    program = jax.jit(build_stereo_program(TINY, predictor.model))
    compiled = program.lower(variables, left, left).compile()
    hlo = compiled.as_text()
    for op in ("all-reduce", "all-gather", "collective-permute", "all-to-all",
               "reduce-scatter"):
        assert op not in hlo, f"unexpected collective {op} in DP forward"


def test_train_step_has_gradient_psum_only(mesh):
    """The DP train step all-reduces gradients — and nothing else."""
    cfg = dataclasses.replace(TINY, batch_size=8)
    state = train.make_train_state(cfg, seed=0)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    rng = np.random.default_rng(0)
    b, h, w = 8, 32, 64
    batch = {
        "left": shard_batch(
            jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)), mesh
        ),
        "right": shard_batch(
            jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8)), mesh
        ),
        "gt_disp": shard_batch(
            jnp.asarray(rng.uniform(1, 16, (b, h, w)).astype(np.float32)), mesh
        ),
        "valid": shard_batch(jnp.ones((b, h, w), bool), mesh),
    }
    step = train.make_stereo_train_step(cfg)
    compiled = step.lower(state, batch).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo  # gradient psum over the data axis
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # Params stay replicated after the update.
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_temporal_train_step_sharded(mesh):
    """The temporal (depth+pose) step runs DP-sharded: both networks'
    gradients sync (all-reduce present), params stay replicated, and the
    batch stays sharded — the multi-chip story covers every train mode,
    not just stereo."""
    from scenedepthestimation_tpu.configs import MonoConfig

    cfg = RunConfig(
        name="t_temporal_sh", pipeline="mono", batch_size=8,
        mono=MonoConfig(height=32, width=64),
    )
    rng = np.random.default_rng(0)
    frames = shard_batch(
        jnp.asarray(
            rng.integers(0, 256, (8, 3, 32, 64, 3), dtype=np.uint8)
        ),
        mesh,
    )
    k = shard_batch(
        jnp.asarray(
            np.broadcast_to(
                np.array(
                    [[40.0, 0, 32], [0, 40.0, 16], [0, 0, 1]], np.float32
                ),
                (8, 3, 3),
            )
        ),
        mesh,
    )
    batch = {"frames": frames, "K": k}
    state = train.make_temporal_train_state(cfg, seed=0)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    step = train.make_mono_temporal_train_step(cfg)
    hlo = step.lower(state, batch).compile().as_text()
    assert "all-reduce" in hlo  # gradient psum over the data axis
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    leaf = jax.tree.leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_uneven_batch_rejected(mesh):
    """Batch not divisible by mesh size must fail loudly, not silently."""
    with pytest.raises(ValueError):
        shard_batch(jnp.zeros((3, 4, 4, 3)), mesh).sharding  # noqa: B018


def test_pallas_correlation_partitions_without_collectives(mesh):
    """A pallas_call is an opaque custom-call GSPMD would all-gather;
    the custom_partitioning registration must keep batch sharding local
    (config-5 scaling depends on it)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from scenedepthestimation_tpu.ops.correlation import _correlation_jnp
    from scenedepthestimation_tpu.ops.pallas.correlation import (
        correlation_pallas,
    )

    rng = np.random.default_rng(0)
    a = rng.normal(size=(8, 4, 32, 16)).astype(np.float32)
    b = rng.normal(size=(8, 4, 32, 16)).astype(np.float32)
    fl = jax.device_put(jnp.asarray(a), NamedSharding(mesh, P("data")))
    fr = jax.device_put(jnp.asarray(b), NamedSharding(mesh, P("data")))
    f = jax.jit(lambda x, y: correlation_pallas(x, y, 8, True))
    hlo = f.lower(fl, fr).compile().as_text()
    for op in ("all-gather", "all-reduce", "collective-permute", "all-to-all"):
        assert op not in hlo, op
    out = f(fl, fr)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_correlation_jnp(jnp.asarray(a), jnp.asarray(b), 8)),
        atol=1e-6,
    )
