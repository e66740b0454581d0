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


def test_conv3x3_fused_matches_xla():
    from scenedepthestimation_tpu.ops.pallas.conv_block import (
        conv3x3_elu_pallas,
        conv3x3_xla,
    )

    rng = np.random.default_rng(10)
    for shape in [(2, 16, 24, 8, 12), (1, 8, 10, 3, 5), (1, 12, 20, 16, 16)]:
        b, h, w, cin, cout = shape
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
        k = jnp.asarray((rng.normal(size=(3, 3, cin, cout)) * 0.1).astype(np.float32))
        bb = jnp.asarray((rng.normal(size=(cout,)) * 0.1).astype(np.float32))
        want = conv3x3_xla(x, k, bb)
        got = conv3x3_elu_pallas(x, k, bb, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-6, err_msg=str(shape)
        )


def test_conv3x3_fused_vjp_matches_xla():
    import jax

    import scenedepthestimation_tpu.ops.pallas.conv_block as cb

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(1, 8, 12, 6)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(3, 3, 6, 4)) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.normal(size=(4,)) * 0.1).astype(np.float32))

    orig = cb.conv3x3_elu_pallas
    cb.conv3x3_elu_pallas = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
    try:
        gx, gk, gb = jax.grad(
            lambda *args: cb.conv3x3_fused(*args, "elu").sum(), argnums=(0, 1, 2)
        )(x, k, b)
    finally:
        cb.conv3x3_elu_pallas = orig
    wx, wk, wb = jax.grad(
        lambda *args: cb.conv3x3_xla(*args, "elu").sum(), argnums=(0, 1, 2)
    )(x, k, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(wb), atol=1e-5)


def test_decoder_convblock_param_tree_unchanged():
    """PallasConv3x3 must keep the exact nn.Conv param layout so torch
    import and old checkpoints keep working."""
    import jax

    from scenedepthestimation_tpu.models.unet_decoder import ConvBlock

    variables = ConvBlock(channels=8).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4))
    )
    kernel = variables["params"]["conv"]["kernel"]
    bias = variables["params"]["conv"]["bias"]
    assert kernel.shape == (3, 3, 4, 8)
    assert bias.shape == (8,)
