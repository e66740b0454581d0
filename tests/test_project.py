"""3-D reprojection + PoseNet + temporal self-sup tests (SURVEY C14)."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from scenedepthestimation_tpu.ops import project


def _k(b=1, f=50.0, cx=16.0, cy=8.0):
    k = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], np.float32)
    return jnp.asarray(np.broadcast_to(k, (b, 3, 3)))


def test_backproject_project_roundtrip():
    k = _k()
    k_inv = jnp.linalg.inv(k)
    depth = jnp.asarray(
        np.random.default_rng(0).uniform(1, 10, (1, 16, 32)).astype(np.float32)
    )
    pts = project.backproject(depth, k_inv)
    coords = project.project(pts, k)
    grid = project.pixel_grid(16, 32)[..., :2]
    np.testing.assert_allclose(np.asarray(coords[0]), np.asarray(grid), atol=1e-3)


def test_pose_identity():
    t = project.pose_vec_to_mat(jnp.zeros((2, 3)), jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(t), np.broadcast_to(np.eye(4), (2, 4, 4)), atol=1e-6)


def test_pose_inverse_composes_to_identity():
    rng = np.random.default_rng(1)
    aa = jnp.asarray(rng.normal(0, 0.3, (3, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(0, 1.0, (3, 3)).astype(np.float32))
    t = project.pose_vec_to_mat(aa, tr)
    t_inv = project.pose_vec_to_mat(aa, tr, invert=True)
    prod = jnp.einsum("bij,bjk->bik", t, t_inv)
    np.testing.assert_allclose(
        np.asarray(prod), np.broadcast_to(np.eye(4), (3, 4, 4)), atol=1e-5
    )


def test_rotation_is_orthonormal():
    aa = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    t = project.pose_vec_to_mat(aa, jnp.zeros((1, 3)))
    r = np.asarray(t[0, :3, :3])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)


def test_bilinear_sample_identity_grid():
    img = jnp.asarray(
        np.random.default_rng(2).uniform(0, 1, (1, 8, 12, 3)).astype(np.float32)
    )
    coords = project.pixel_grid(8, 12)[..., :2][None]
    out, valid = project.bilinear_sample(img, coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    assert np.asarray(valid).all()


def test_pack4_matches_gather4_values_and_grads():
    # The TPU corner-packed single-gather form is an exact rewrite of
    # the 4-gather form: same values AND same gradients (into coords
    # through the lerp weights, into img through the gather/table).
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.uniform(0, 1, (2, 9, 13, 3)).astype(np.float32))
    # Coords beyond the frame on every side to exercise the clamps.
    cx = rng.uniform(-3, 15, (2, 9, 13)).astype(np.float32)
    cy = rng.uniform(-3, 11, (2, 9, 13)).astype(np.float32)
    coords = jnp.asarray(np.stack([cx, cy], axis=-1))

    out_g = project._sample_gather4(img, coords)
    out_p = project._sample_pack4(img, coords)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g), atol=1e-6)

    def loss(fn, i_, c_):
        return (fn(i_, c_) * jnp.cos(jnp.arange(3.0))).sum()

    gi_g, gc_g = jax.grad(lambda i_, c_: loss(project._sample_gather4, i_, c_), (0, 1))(img, coords)
    gi_p, gc_p = jax.grad(lambda i_, c_: loss(project._sample_pack4, i_, c_), (0, 1))(img, coords)
    np.testing.assert_allclose(np.asarray(gc_p), np.asarray(gc_g), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gi_p), np.asarray(gi_g), atol=1e-5)


def test_bilinear_sample_dispatch_override():
    img = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (1, 8, 12, 3)).astype(np.float32)
    )
    coords = project.pixel_grid(8, 12)[..., :2][None] + 0.3
    try:
        project.set_use_pack4(True)
        out_p, _ = project.bilinear_sample(img, coords)
        project.set_use_pack4(False)
        out_g, _ = project.bilinear_sample(img, coords)
    finally:
        project.set_use_pack4(None)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_g), atol=1e-6)


def test_temporal_loss_cfirst_matches_nhwc():
    """The channels-first loss body (TPU layout) is an exact layout
    rewrite of the NHWC body: same loss value, same gradients into the
    disparities and poses."""
    from scenedepthestimation_tpu import losses

    rng = np.random.default_rng(11)
    b, h, w = 2, 16, 32
    target = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    sources = [
        jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        for _ in range(2)
    ]
    disps = {
        s: jnp.asarray(
            rng.uniform(0.1, 0.9, (b, h >> s, w >> s, 1)).astype(np.float32)
        )
        for s in range(3)
    }
    k = jnp.broadcast_to(
        jnp.asarray([[20.0, 0, 16], [0, 20.0, 8], [0, 0, 1]]), (b, 3, 3)
    )
    k_inv = jnp.linalg.inv(k)
    aa = jnp.asarray(rng.normal(0, 0.02, (b, 2, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(0, 0.05, (b, 2, 3)).astype(np.float32))

    def loss_of(disps_, aa_, tr_):
        t_mats = [
            project.pose_vec_to_mat(aa_[:, 0], tr_[:, 0], invert=True),
            project.pose_vec_to_mat(aa_[:, 1], tr_[:, 1]),
        ]
        return losses.mono_temporal_selfsup_loss(
            disps_, target, sources, t_mats, k, k_inv, 0.1, 100.0
        )

    try:
        losses.set_use_cfirst(True)
        v_cf, g_cf = jax.value_and_grad(loss_of, argnums=(0, 1, 2))(disps, aa, tr)
        losses.set_use_cfirst(False)
        v_nh, g_nh = jax.value_and_grad(loss_of, argnums=(0, 1, 2))(disps, aa, tr)
    finally:
        losses.set_use_cfirst(None)

    np.testing.assert_allclose(float(v_cf), float(v_nh), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_cf), jax.tree_util.tree_leaves(g_nh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


def test_upsample2x_rank3_matches_nhwc():
    from scenedepthestimation_tpu.ops.upsample import upsample2x, upsample2x_rank3

    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 7, 9)).astype(np.float32)
    )
    a = upsample2x_rank3(x)
    b = upsample2x(x[..., None], mode="bilinear")[..., 0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_reproject_identity_pose_identity_image():
    """Zero pose + any depth must reconstruct the image exactly."""
    img = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (1, 16, 32, 3)).astype(np.float32)
    )
    depth = jnp.full((1, 16, 32), 5.0)
    k = _k()
    t = project.pose_vec_to_mat(jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    recon, valid = project.reproject_sample(img, depth, k, jnp.linalg.inv(k), t)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(img), atol=1e-5)


def test_reproject_lateral_translation_shifts_image():
    """Camera translated +x by (depth/f) px-equivalent → image shifts."""
    img = jnp.asarray(np.arange(32, dtype=np.float32)[None, None, :, None])
    img = jnp.broadcast_to(img, (1, 16, 32, 1))
    depth = jnp.full((1, 16, 32), 10.0)
    k = _k(f=10.0)
    # translation tx = 1m at depth 10 with f=10 → shift of 1 px
    t = project.pose_vec_to_mat(jnp.zeros((1, 3)), jnp.asarray([[1.0, 0, 0]]))
    recon, _ = project.reproject_sample(img, depth, k, jnp.linalg.inv(k), t)
    # recon(x) == img(x + 1)
    np.testing.assert_allclose(
        np.asarray(recon[0, 8, 5:25, 0]), np.arange(6, 26, dtype=np.float32), atol=1e-4
    )


def test_posenet_shapes():
    from scenedepthestimation_tpu.models.posenet import PoseNet

    net = PoseNet()
    pair = jnp.zeros((2, 32, 64, 6))
    variables = net.init(jax.random.PRNGKey(0), pair)
    aa, tr = net.apply(variables, pair)
    assert aa.shape == (2, 3) and tr.shape == (2, 3)
    # 0.01 scaling keeps early poses tiny
    assert float(jnp.abs(aa).max()) < 0.5


def test_temporal_train_step_runs_and_descends():
    from scenedepthestimation_tpu import train
    from scenedepthestimation_tpu.configs import MonoConfig, RunConfig

    cfg = RunConfig(
        name="t_temporal", pipeline="mono", batch_size=2,
        mono=MonoConfig(height=32, width=64),
    )
    rng = np.random.default_rng(4)
    base = np.cumsum(rng.normal(0, 2, (2, 32, 64, 3)), axis=2)
    tgt = ((base - base.min()) / np.ptp(base) * 255).astype(np.uint8)
    prev = np.roll(tgt, 2, axis=2)
    nxt = np.roll(tgt, -2, axis=2)
    frames = np.stack([prev, tgt, nxt], axis=1)  # (B, 3, H, W, 3)
    k = np.broadcast_to(
        np.array([[40.0, 0, 32], [0, 40.0, 16], [0, 0, 1]], np.float32), (2, 3, 3)
    )
    batch = {"frames": frames, "K": k}

    state = train.make_temporal_train_state(cfg, seed=0, learning_rate=1e-3)
    step = train.make_mono_temporal_train_step(cfg)
    for _ in range(3):
        state, m = step(state, batch)
    anchor = float(m["loss"])
    assert np.isfinite(anchor)
    for _ in range(6):
        state, m = step(state, batch)
    assert float(m["loss"]) <= anchor * 1.05  # descends or holds (automask floor)
    assert int(state.step) == 9


def test_temporal_loss_at_scale_parity_and_cost_shape():
    """at_scale protocol (monodepth-v1): the cfirst and NHWC bodies
    agree in value and gradients, and the value differs from the
    full-res protocol (it is a different objective, not a rewrite)."""
    from scenedepthestimation_tpu import losses

    rng = np.random.default_rng(13)
    b, h, w = 2, 16, 32
    target = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    sources = [
        jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
        for _ in range(2)
    ]
    disps = {
        s: jnp.asarray(
            rng.uniform(0.1, 0.9, (b, h >> s, w >> s, 1)).astype(np.float32)
        )
        for s in range(3)
    }
    k = jnp.broadcast_to(
        jnp.asarray([[20.0, 0, 16], [0, 20.0, 8], [0, 0, 1]]), (b, 3, 3)
    )
    k_inv = jnp.linalg.inv(k)
    aa = jnp.asarray(rng.normal(0, 0.02, (b, 2, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(0, 0.05, (b, 2, 3)).astype(np.float32))

    def loss_of(disps_, aa_, tr_, at_scale):
        t_mats = [
            project.pose_vec_to_mat(aa_[:, 0], tr_[:, 0], invert=True),
            project.pose_vec_to_mat(aa_[:, 1], tr_[:, 1]),
        ]
        return losses.mono_temporal_selfsup_loss(
            disps_, target, sources, t_mats, k, k_inv, 0.1, 100.0,
            at_scale=at_scale,
        )

    try:
        losses.set_use_cfirst(True)
        v_cf, g_cf = jax.value_and_grad(loss_of, argnums=(0, 1, 2))(
            disps, aa, tr, True
        )
        losses.set_use_cfirst(False)
        v_nh, g_nh = jax.value_and_grad(loss_of, argnums=(0, 1, 2))(
            disps, aa, tr, True
        )
        v_full = loss_of(disps, aa, tr, False)
    finally:
        losses.set_use_cfirst(None)

    np.testing.assert_allclose(float(v_cf), float(v_nh), rtol=1e-5)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_cf), jax.tree_util.tree_leaves(g_nh)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
    # Different protocol => different objective value.
    assert abs(float(v_cf) - float(v_full)) > 1e-6
    # Scale-0-only disparity still gets gradient signal in both.
    assert float(jnp.abs(g_cf[0][0]).sum()) > 0


def test_temporal_step_with_num_scales_and_at_scale():
    """The train step composes with scales=(0,1) + temporal_at_scale
    (the CLI's --num-scales 2 --at-scale) and descends."""
    import dataclasses

    from scenedepthestimation_tpu import train
    from scenedepthestimation_tpu.configs import MonoConfig, RunConfig

    cfg = RunConfig(
        name="tiny_at_scale", pipeline="mono", batch_size=2,
        mono=MonoConfig(
            height=32, width=64, scales=(0, 1), temporal_at_scale=True
        ),
    )
    rng = np.random.default_rng(5)
    k = np.array([[40.0, 0, 32], [0, 40.0, 16], [0, 0, 1]], np.float32)
    batch = {
        "frames": rng.integers(0, 256, (2, 3, 32, 64, 3), dtype=np.uint8),
        "K": np.stack([k, k]),
    }
    state = train.make_temporal_train_state(cfg, seed=0)
    step = train.make_mono_temporal_train_step(cfg)
    state, m0 = step(state, batch)
    for _ in range(6):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_temporal_train_step_with_augmentation():
    """augment=True (VERDICT r4 missing-#3): the step accepts an 'rng'
    key, compiles, produces a finite loss, and updates BOTH networks'
    params (flip + jitter must not cut the gradient path)."""
    import jax as _jax

    from scenedepthestimation_tpu import train
    from scenedepthestimation_tpu.configs import MonoConfig, RunConfig

    cfg = RunConfig(
        name="t_temporal_aug", pipeline="mono", batch_size=2,
        mono=MonoConfig(height=32, width=64),
    )
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (2, 3, 32, 64, 3), dtype=np.uint8)
    k = np.broadcast_to(
        np.array([[40.0, 0, 30.0], [0, 40.0, 16], [0, 0, 1]], np.float32),
        (2, 3, 3),
    ).copy()
    batch = {"frames": frames, "K": k, "rng": _jax.random.PRNGKey(3)}

    state = train.make_temporal_train_state(cfg, seed=0, learning_rate=1e-3)
    p0 = _jax.tree_util.tree_map(np.asarray, state.params)
    step = train.make_mono_temporal_train_step(cfg, augment=True)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    p1 = state.params
    depth_moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(
            _jax.tree_util.tree_leaves(p0["depth"]),
            _jax.tree_util.tree_leaves(p1["depth"]),
        )
    )
    pose_moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(
            _jax.tree_util.tree_leaves(p0["pose"]),
            _jax.tree_util.tree_leaves(p1["pose"]),
        )
    )
    assert depth_moved and pose_moved
