"""Upsampling semantics (ops/upsample.py): torch-parity for the 2x
modes (the docstring's contract) and exactness of the packed 4x
bilinear parity-plane form.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from scenedepthestimation_tpu.ops.upsample import (
    upsample2x,
    upsample4x_bilinear_packed,
)


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_upsample2x_matches_torch(mode):
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 9, 3)).astype(np.float32)
    got = np.asarray(upsample2x(jnp.asarray(x), mode=mode))
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        F.interpolate(
            tx,
            scale_factor=2,
            mode=mode,
            **({} if mode == "nearest" else {"align_corners": False}),
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("c", [1, 3])
def test_upsample4x_packed_matches_composition(c):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 10, c)).astype(np.float32))
    want = np.asarray(
        upsample2x(upsample2x(x, mode="bilinear"), mode="bilinear")
    )
    got = np.asarray(upsample4x_bilinear_packed(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-6)
