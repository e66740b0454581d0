"""Stereo refinement + multi-scale supervision + LR warmup + soft-argmin
temperature (VERDICT r1 next-#3/#5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scenedepthestimation_tpu import train
from scenedepthestimation_tpu.configs import RunConfig, StereoConfig
from scenedepthestimation_tpu.models.stereo import StereoNet
from scenedepthestimation_tpu.ops.soft_argmin import soft_argmin

CFG = StereoConfig(height=32, width=64, max_disp=16, feat_channels=16)


def test_soft_argmin_temperature_sharpens():
    rng = np.random.default_rng(0)
    # Shuffled integer costs: the best-vs-rest gap is ≥ 0.5, so τ = 0.05
    # drives the softmax to ~one-hot (e^-10 tail).
    cost = rng.permuted(
        np.broadcast_to(np.arange(12, dtype=np.float32) * 0.5, (1, 4, 8, 12)).copy(),
        axis=-1,
    )
    cost = jnp.asarray(cost)
    default = soft_argmin(cost)
    sharp = soft_argmin(cost, temperature=0.05)
    hard = jnp.argmin(cost, axis=-1).astype(jnp.float32)
    # τ→0 approaches the hard argmin; τ=1 matches the old behaviour.
    assert float(jnp.abs(sharp - hard).max()) < 0.05
    np.testing.assert_allclose(
        np.asarray(default), np.asarray(soft_argmin(cost, temperature=1.0))
    )


def test_refine_identity_at_init():
    """Zero-initialized residual head → refined output == coarse readout
    shape-wise, and the refinement starts as the identity."""
    import dataclasses

    rng = np.random.default_rng(1)
    l = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(1, 32, 64, 3)).astype(np.float32))

    base = StereoNet(cfg=CFG)
    vb = base.init(jax.random.PRNGKey(0), l, r)
    refined_cfg = dataclasses.replace(CFG, refine=True)
    ref = StereoNet(cfg=refined_cfg)
    vr = ref.init(jax.random.PRNGKey(0), l, r)

    assert "refinement" in vr["params"]
    assert "refinement" not in vb["params"]
    # Shared trunk params initialize identically (same RNG path prefix is
    # not guaranteed by flax, so compare behaviour instead): residual head
    # is zero-initialized, so refined disp == its own coarse readout.
    disp, aux = ref.apply(vr, l, r, return_aux=True)
    assert disp.shape == (1, 32, 64)
    assert len(aux) == 3  # pre-refinement + two intermediate scales
    for a in aux:
        assert a.shape == (1, 32, 64)
    np.testing.assert_allclose(
        np.asarray(disp), np.asarray(aux[0]), atol=1e-5
    )  # identity at init


def test_refine_train_step_descends():
    import dataclasses

    cfg = RunConfig(
        name="t_refine",
        pipeline="stereo",
        batch_size=2,
        stereo=dataclasses.replace(CFG, refine=True, softargmin_temperature=0.5),
    )
    rng = np.random.default_rng(2)
    batch = {
        "left": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "right": rng.integers(0, 256, (2, 32, 64, 3), dtype=np.uint8),
        "gt_disp": rng.uniform(1, 12, (2, 32, 64)).astype(np.float32),
        "valid": np.ones((2, 32, 64), bool),
    }
    state = train.make_train_state(cfg, seed=0, warmup_steps=5)
    step = train.make_stereo_train_step(cfg)
    state, m0 = step(state, batch)
    for _ in range(14):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_warmup_schedule():
    sched = train.make_lr_schedule(1e-3, warmup_steps=100)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(50)) == pytest.approx(5e-4)
    assert float(sched(100)) == pytest.approx(1e-3)
    # After warmup the step decay takes over from the boundary.
    assert float(sched(101)) == pytest.approx(1e-3, rel=1e-3)
    no_warmup = train.make_lr_schedule(1e-3)
    assert float(no_warmup(0)) == pytest.approx(1e-3)


def test_load_weights_autodetects_refine_checkpoint(tmp_path):
    """A refine-trained checkpoint loaded with a refine=False config must
    auto-enable refinement (flax would otherwise silently drop the head
    and serve the coarse readout; r2 review finding)."""
    import dataclasses

    from scenedepthestimation_tpu import api, configs
    from scenedepthestimation_tpu.utils import checkpoint

    refined_cfg = dataclasses.replace(CFG, refine=True)
    model = StereoNet(cfg=refined_cfg)
    z = jnp.zeros((1, CFG.height, CFG.width, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z, z)
    assert "refinement" in variables["params"]
    checkpoint.save_variables(str(tmp_path / "ckpt"), variables)

    base = dataclasses.replace(
        configs.get("stereo_256x512_b4"),
        stereo=CFG,  # refine=False
    )
    predictor = api.load_weights(str(tmp_path / "ckpt"), base)
    assert predictor.cfg.stereo.refine is True
    out = predictor.stereo_forward(
        jnp.zeros((1, CFG.height, CFG.width, 3), jnp.uint8),
        jnp.zeros((1, CFG.height, CFG.width, 3), jnp.uint8),
    )
    assert np.asarray(out["disp"]).shape == (1, CFG.height, CFG.width)
