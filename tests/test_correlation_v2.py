"""Gram+shear correlation kernel (ops/pallas/correlation_v2.py) vs the
jnp oracle, interpret mode."""

import numpy as np
import pytest
import jax.numpy as jnp

from scenedepthestimation_tpu.ops.correlation import _correlation_jnp
from scenedepthestimation_tpu.ops.pallas.correlation_v2 import (
    correlation_pallas_v2,
)


@pytest.mark.parametrize("shape,d", [((2, 4, 32, 8), 8), ((1, 3, 48, 16), 12)])
def test_correlation_v2_matches_oracle(shape, d):
    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    want = np.asarray(_correlation_jnp(fl, fr, d))
    got = np.asarray(correlation_pallas_v2(fl, fr, d, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)
