"""Fused Winograd F(2x2,3x3) Pallas conv (ops/pallas/winograd.py) vs the
direct-conv oracle. The kernel is a recorded DECLINED experiment (see
its module docstring for the on-chip numbers); these tests pin its
correctness so the negative result stays reproducible.

Interpret mode on the CPU backend (tests/conftest.py), tiny shapes —
this box has one CPU core."""

import jax.numpy as jnp
import numpy as np
import pytest

from scenedepthestimation_tpu.ops.pallas.winograd import (
    conv3x3_reference,
    phases_to_space,
    space_to_phases,
    transform_weights,
    winograd_conv3x3,
    winograd_conv3x3_phases,
)


def _data(b=1, h=8, w=16, c=8, co=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(3, 3, c, co)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(co,)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, h, w, co)), jnp.float32)
    return x, g, bias, res


def test_phases_roundtrip():
    x, *_ = _data(b=2, h=6, w=10, c=4)
    np.testing.assert_array_equal(
        np.asarray(phases_to_space(space_to_phases(x))), np.asarray(x)
    )


def test_weight_transform_shape_and_identity_row():
    _, g, _, _ = _data()
    u = transform_weights(g)
    assert u.shape == (16,) + g.shape[2:]
    # U[0] = g[0,0] exactly (G row 0 = [1,0,0]).
    np.testing.assert_allclose(np.asarray(u[0]), np.asarray(g[0, 0]), atol=0)


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("use_res", [False, True])
def test_winograd_matches_direct_conv(relu, use_res):
    x, g, bias, res = _data()
    got = winograd_conv3x3(
        x, g, bias, residual=res if use_res else None, relu=relu,
        interpret=True,
    )
    ref = conv3x3_reference(
        x, g, bias, residual=res if use_res else None, relu=relu
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_winograd_multiblock_halos():
    # hp=16 -> th=16 would fit VMEM; force th=4 so n_h=4 exercises both
    # halo directions and the first/last masking.
    x, g, bias, _ = _data(b=2, h=32, w=12, c=4, co=8, seed=1)
    u = transform_weights(g)
    outs = winograd_conv3x3_phases(
        space_to_phases(x), u, bias, relu=True, interpret=True, th=4
    )
    got = phases_to_space(outs)
    ref = conv3x3_reference(x, g, bias, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
