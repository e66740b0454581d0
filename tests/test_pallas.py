"""Per-kernel Pallas unit tests vs jnp oracles (SURVEY §4.2).

Runs in interpreter mode on the CPU test backend — the "sanitizer" pass
for index/OOB bugs (SURVEY §5.2). Compiled-mode equivalence on the real
chip is exercised by bench/kernels.py.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from scenedepthestimation_tpu.ops.correlation import _correlation_jnp
from scenedepthestimation_tpu.ops.soft_argmin import _soft_argmin_jnp
from scenedepthestimation_tpu.ops.upsample import upsample_concat
from scenedepthestimation_tpu.ops.pallas.correlation import correlation_pallas
from scenedepthestimation_tpu.ops.pallas.soft_argmin import soft_argmin_pallas
from scenedepthestimation_tpu.ops.pallas.upsample_concat import (
    upsample_concat_pallas,
)


def test_correlation_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.normal(size=(2, 4, 32, 16)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(2, 4, 32, 16)).astype(np.float32))
    want = _correlation_jnp(fl, fr, 8)
    got = correlation_pallas(fl, fr, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_correlation_kernel_bf16_drift():
    rng = np.random.default_rng(1)
    fl32 = rng.normal(size=(1, 4, 16, 8)).astype(np.float32)
    fr32 = rng.normal(size=(1, 4, 16, 8)).astype(np.float32)
    want = _correlation_jnp(jnp.asarray(fl32), jnp.asarray(fr32), 4)
    got = correlation_pallas(
        jnp.asarray(fl32, jnp.bfloat16), jnp.asarray(fr32, jnp.bfloat16), 4,
        interpret=True,
    ).astype(jnp.float32)
    # bf16 inputs, fp32 accumulation: drift bounded by input rounding.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-2)


def test_correlation_kernel_odd_rows():
    """B*H not divisible by 8 → rows-per-block fallback still covers all."""
    rng = np.random.default_rng(2)
    fl = jnp.asarray(rng.normal(size=(1, 3, 16, 8)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(1, 3, 16, 8)).astype(np.float32))
    want = _correlation_jnp(fl, fr, 4)
    got = correlation_pallas(fl, fr, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_soft_argmin_kernel_matches_oracle():
    rng = np.random.default_rng(3)
    cost = jnp.asarray(rng.normal(size=(2, 4, 16, 24)).astype(np.float32))
    want = _soft_argmin_jnp(cost)
    got = soft_argmin_pallas(cost, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_soft_argmin_kernel_scale_and_depth_epilogue():
    rng = np.random.default_rng(4)
    cost = jnp.asarray(rng.normal(size=(1, 2, 8, 16)).astype(np.float32))
    disp = _soft_argmin_jnp(cost) * 4.0
    fb = 721.0 * 0.54
    want = fb / np.maximum(np.asarray(disp), 1e-6)
    got = soft_argmin_pallas(cost, scale=4.0, epilogue="depth", fb=fb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_upsample_concat_kernel_matches_oracle():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 16)).astype(np.float32))
    skip = jnp.asarray(rng.normal(size=(2, 8, 16, 12)).astype(np.float32))
    want = upsample_concat(x, skip, mode="nearest")
    got = upsample_concat_pallas(x, skip, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_upsample_concat_kernel_shape_guard():
    x = jnp.zeros((1, 4, 8, 3))
    bad_skip = jnp.zeros((1, 9, 16, 3))
    with pytest.raises(ValueError, match="does not match"):
        upsample_concat_pallas(x, bad_skip, interpret=True)


def test_correlation_pallas_vjp_matches_oracle():
    """Training on TPU differentiates through the Pallas kernel — the
    custom VJP must match jax.grad of the jnp oracle exactly."""
    import jax

    from scenedepthestimation_tpu.ops.correlation import (
        _correlation_jnp,
        _correlation_pallas_op,
    )

    rng = np.random.default_rng(9)
    fl = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    fr = jnp.asarray(rng.normal(size=(2, 4, 16, 8)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 4, 16, 4)).astype(np.float32))

    def loss_oracle(a, b):
        return jnp.sum(_correlation_jnp(a, b, 4) * g)

    want_fl, want_fr = jax.grad(loss_oracle, argnums=(0, 1))(fl, fr)

    # Pallas forward runs in interpret mode on CPU; the custom bwd is jnp.
    import scenedepthestimation_tpu.ops.pallas.correlation as pc

    orig = pc.correlation_pallas
    pc_interp = lambda a, b, d, interpret=True: orig(a, b, d, interpret=True)
    pc.correlation_pallas = pc_interp
    try:

        def loss_pallas(a, b):
            from scenedepthestimation_tpu.ops.correlation import (
                _correlation_pallas_op,
            )

            return jnp.sum(_correlation_pallas_op(a, b, 4) * g)

        got_fl, got_fr = jax.grad(loss_pallas, argnums=(0, 1))(fl, fr)
    finally:
        pc.correlation_pallas = orig

    np.testing.assert_allclose(np.asarray(got_fl), np.asarray(want_fl), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_fr), np.asarray(want_fr), atol=1e-5)
