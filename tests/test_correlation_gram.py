"""Tiled banded-Gram correlation (ops/correlation._correlation_gram)
vs the jnp oracle + its v3 Pallas sibling (round 3).

The Gram formulation is the bf16 serving path's correlation (2.1x the
v1 Pallas kernel at config-5 b16 — BASELINE.md round-3); it must be
EXACT vs the oracle in fp32 (the band extract is pure indexing), and
differentiable (it replaces the custom-VJP kernel on the bf16 path).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.ops.correlation import (
    _correlation_gram,
    _correlation_jnp,
    correlation1d,
    set_use_gram,
)


# Shapes straddle the T=64 tile: w < T (one padded tile), w % T != 0
# (partial tail tile), w % T == 0, and the config-5 aspect (w=288).
@pytest.mark.parametrize(
    "shape,d",
    [
        ((2, 4, 32, 8), 8),
        ((1, 3, 130, 16), 12),
        ((2, 2, 128, 8), 16),
        ((1, 2, 288, 16), 48),
    ],
)
def test_gram_matches_oracle_fp32(shape, d):
    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    want = np.asarray(_correlation_jnp(fl, fr, d))
    got = np.asarray(_correlation_gram(fl, fr, d))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gram_matches_v3_pallas_interpret():
    from scenedepthestimation_tpu.ops.pallas.correlation_v3 import (
        correlation_pallas_v3,
    )

    rng = np.random.default_rng(1)
    fl = jnp.asarray(rng.normal(size=(2, 3, 160, 8)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(2, 3, 160, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(correlation_pallas_v3(fl, fr, 12, interpret=True)),
        np.asarray(_correlation_gram(fl, fr, 12)),
        atol=1e-5,
    )


def test_gram_gradients_match_oracle():
    """The bf16 dispatch replaces the custom-VJP kernel — XLA autodiff
    through the Gram path must agree with the oracle's gradients."""
    rng = np.random.default_rng(2)
    fl = jnp.asarray(rng.normal(size=(1, 2, 40, 8)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(1, 2, 40, 8)).astype(np.float32))

    def loss_gram(a, b):
        return (_correlation_gram(a, b, 8) ** 2).sum()

    def loss_ref(a, b):
        return (_correlation_jnp(a, b, 8) ** 2).sum()

    ga = jax.grad(loss_gram, argnums=(0, 1))(fl, fr)
    gr = jax.grad(loss_ref, argnums=(0, 1))(fl, fr)
    for x, y in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_dispatch_bf16_uses_gram():
    """correlation1d on bf16 inputs routes to the Gram path (flag
    override respected both ways)."""
    rng = np.random.default_rng(3)
    fl = jnp.asarray(rng.normal(size=(1, 2, 40, 8)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(1, 2, 40, 8)).astype(np.float32))
    flb, frb = fl.astype(jnp.bfloat16), fr.astype(jnp.bfloat16)
    auto = correlation1d(flb, frb, 8)
    want = _correlation_gram(flb, frb, 8)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(want), atol=1e-6)
    try:
        set_use_gram(False)
        off = correlation1d(flb, frb, 8)  # oracle on CPU backend
        np.testing.assert_allclose(
            np.asarray(off),
            np.asarray(_correlation_jnp(flb, frb, 8)),
            atol=1e-6,
        )
    finally:
        set_use_gram(None)
