"""BN-folded encoder parity (models/folded.py).

The folded forward must match the unfolded ResNetEncoder inference pass
with NON-TRIVIAL statistics (init stats are mean=0/var=1, which would
hide scale/shift bugs) at every pyramid level.
"""

import numpy as np
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu.models.folded import (
    fold_encoder_bn,
    folded_encoder_apply,
)
from scenedepthestimation_tpu.models.resnet import ResNetEncoder


def _randomize_stats(tree, rng):
    def rnd(path, a):
        name = "/".join(str(p) for p in path)
        if "mean" in name:
            return jnp.asarray(rng.normal(0, 0.5, a.shape).astype(np.float32))
        if "var" in name:
            return jnp.asarray(rng.uniform(0.2, 2.0, a.shape).astype(np.float32))
        return a

    return jax.tree_util.tree_map_with_path(rnd, tree)


def _randomize_bn_params(tree, rng):
    def rnd(path, a):
        name = "/".join(str(p) for p in path)
        if "scale" in name:
            return jnp.asarray(rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
        if name.endswith("bias") and a.ndim == 1 and "conv" not in name:
            return jnp.asarray(rng.normal(0, 0.3, a.shape).astype(np.float32))
        return a

    return jax.tree_util.tree_map_with_path(rnd, tree)


def test_folded_encoder_matches_unfolded():
    rng = np.random.default_rng(0)
    enc = ResNetEncoder(num_layers=18)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 96, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    params = _randomize_bn_params(variables["params"], rng)
    stats = _randomize_stats(variables["batch_stats"], rng)

    want = ResNetEncoder(num_layers=18).apply(
        {"params": params, "batch_stats": stats}, x
    )
    folded = fold_encoder_bn(params, stats, num_layers=18)
    got = folded_encoder_apply(folded, x, num_layers=18)

    assert len(got) == len(want)
    for lvl, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-5, rtol=1e-5,
            err_msg=f"level {lvl}",
        )
