"""Space-to-depth stem rewrite (ops/stem.py).

Exactness of the s2d stem conv against the plain strided conv for both
stem shapes in the framework (ResNet conv1 7x7 s2, stereo tower down1
5x5 s2), and of the folded-encoder path with ``s2d_stem=True``.

The rewrite is a measured DECLINE for serving (BASELINE.md round 3:
6.47 vs 5.26 ms at the judged shape — C=12 under-fills lanes like C=3
does) but stays in-tree as an exact, tested experiment.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.stem import (
    DN,
    s2d_stem_conv,
    s2d_stem_kernel,
    space_to_depth2,
)


def _ref_conv(x, k, stride, pad):
    return lax.conv_general_dilated(
        x, k, (stride, stride), ((pad, pad), (pad, pad)), dimension_numbers=DN
    )


def test_s2d_stem_7x7_matches_strided_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 48, 64, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)).astype(np.float32))
    want = _ref_conv(x, k, 2, 3)
    got = s2d_stem_conv(x, s2d_stem_kernel(k), 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_s2d_stem_5x5_matches_strided_conv():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 48, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (5, 5, 3, 32)).astype(np.float32))
    want = _ref_conv(x, k, 2, 2)
    got = s2d_stem_conv(x, s2d_stem_kernel(k), 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_space_to_depth2_channel_order():
    # (dy, dx, c) channel order — the kernel transform depends on it.
    x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
    p = space_to_depth2(x)
    assert p.shape == (2, 2, 3, 12)
    for dy in range(2):
        for dx in range(2):
            for c in range(3):
                np.testing.assert_array_equal(
                    np.asarray(p[:, :, :, (dy * 2 + dx) * 3 + c]),
                    np.asarray(x[:, dy::2, dx::2, c]),
                )


def test_folded_encoder_s2d_stem_parity():
    from scenedepthestimation_tpu.models.folded import (
        fold_encoder_bn,
        folded_encoder_apply,
    )
    from scenedepthestimation_tpu.models.resnet import ResNetEncoder

    rng = np.random.default_rng(2)
    enc = ResNetEncoder(num_layers=18)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    folded = fold_encoder_bn(
        variables["params"], variables["batch_stats"], num_layers=18
    )
    want = folded_encoder_apply(folded, x, num_layers=18)
    got = folded_encoder_apply(folded, x, num_layers=18, s2d_stem=True)
    for lvl, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-5,
            err_msg=f"level {lvl}",
        )
