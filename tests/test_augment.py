"""Augmentation tests (SURVEY C2 train-time aug)."""

import jax
import numpy as np
import jax.numpy as jnp

from scenedepthestimation_tpu.ops import augment


def _img(b=4, h=8, w=12, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).uniform(0, 1, (b, h, w, 3)).astype(np.float32)
    )


def test_hflip_involution():
    x = _img()
    np.testing.assert_array_equal(
        np.asarray(augment.hflip(augment.hflip(x))), np.asarray(x)
    )


def test_random_hflip_p0_p1():
    x = _img()
    out0, f0 = augment.random_hflip(jax.random.PRNGKey(0), x, p=0.0)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))
    assert not np.asarray(f0).any()
    out1, f1 = augment.random_hflip(jax.random.PRNGKey(0), x, p=1.0)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(augment.hflip(x)))
    assert np.asarray(f1).all()


def test_pair_flip_swaps_views():
    l, r = _img(seed=1), _img(seed=2)
    nl, nr, f = augment.random_hflip_pair(jax.random.PRNGKey(0), l, r, p=1.0)
    np.testing.assert_array_equal(np.asarray(nl), np.asarray(augment.hflip(r)))
    np.testing.assert_array_equal(np.asarray(nr), np.asarray(augment.hflip(l)))


def test_color_jitter_range_and_variation():
    x = _img()
    out = augment.color_jitter(jax.random.PRNGKey(0), x)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0
    assert not np.allclose(o, np.asarray(x))
    # zero-strength jitter is identity
    out0 = augment.color_jitter(
        jax.random.PRNGKey(0), x, brightness=0, contrast=0, saturation=0, hue=0
    )
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x), atol=1e-6)


def test_jitter_per_example_independent():
    x = jnp.broadcast_to(_img(b=1), (4, 8, 12, 3))
    out = np.asarray(augment.color_jitter(jax.random.PRNGKey(3), x))
    # identical inputs must get different factors per example
    assert not np.allclose(out[0], out[1])


def test_augment_mono_flips_gt_consistently():
    x = _img()
    gt = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (4, 8, 12, 1)).astype(np.float32)
    )
    batch = {"image": x, "gt_disp": gt}
    out = augment.augment_mono(jax.random.PRNGKey(1), batch, jitter_p=0.0)
    # wherever the image was flipped, the GT must be flipped too: check
    # by matching each output row against flipped/unflipped candidates.
    for i in range(4):
        img_flipped = np.allclose(
            np.asarray(out["image"][i]), np.asarray(augment.hflip(x)[i])
        )
        gt_flipped = np.allclose(
            np.asarray(out["gt_disp"][i]), np.asarray(augment.hflip(gt)[i])
        )
        assert img_flipped == gt_flipped


def test_augment_is_jittable():
    batch = {"image": _img()}
    fn = jax.jit(lambda k, b: augment.augment_mono(k, b))
    out = fn(jax.random.PRNGKey(0), batch)
    assert out["image"].shape == batch["image"].shape


# --- Stereo augmentation (VERDICT r2 next-#5) -------------------------------


def _pair(b=4, h=8, w=12):
    l, r = _img(b, h, w, seed=1), _img(b, h, w, seed=2)
    gt = jnp.asarray(
        np.random.default_rng(3).uniform(0, 40, (b, h, w)).astype(np.float32)
    )
    valid = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (b, h, w)) > 0.3)
    return l, r, gt, valid


def test_color_jitter_pair_shares_factors():
    l, r = _img(seed=1), _img(seed=1)  # identical views
    jl, jr = augment.color_jitter_pair(jax.random.PRNGKey(0), l, r)
    # identical inputs + shared factors => identical outputs
    np.testing.assert_allclose(np.asarray(jl), np.asarray(jr), atol=1e-6)


def test_random_crop_multi_consistent_and_disp_invariant():
    l, r, gt, valid = _pair(h=16, w=24)
    out = augment.random_crop_multi(
        jax.random.PRNGKey(0),
        {"left": l, "right": r, "gt_disp": gt, "valid": valid},
        (8, 12),
    )
    assert out["left"].shape == (4, 8, 12, 3)
    assert out["gt_disp"].shape == (4, 8, 12)
    assert out["valid"].dtype == valid.dtype
    # every cropped gt row must be a contiguous slice of some source row
    # at the SAME offset as the image crop: locate the offset via the
    # image and check gt matches it.
    ln, gtn = np.asarray(l), np.asarray(gt)
    for i in range(4):
        found = False
        for y0 in range(16 - 8 + 1):
            for x0 in range(24 - 12 + 1):
                if np.allclose(
                    np.asarray(out["left"][i]), ln[i, y0 : y0 + 8, x0 : x0 + 12]
                ):
                    np.testing.assert_array_equal(
                        np.asarray(out["gt_disp"][i]),
                        gtn[i, y0 : y0 + 8, x0 : x0 + 12],
                    )
                    found = True
        assert found


def test_augment_stereo_no_flip_with_left_only_gt():
    l, r, gt, valid = _pair()
    batch = {"left": l, "right": r, "gt_disp": gt, "valid": valid}
    out = augment.augment_stereo(
        jax.random.PRNGKey(0), batch, hflip_p=1.0, jitter_p=0.0
    )
    # left-only GT: flip must be DISABLED (not label-preserving)
    np.testing.assert_array_equal(np.asarray(out["left"]), np.asarray(l))
    np.testing.assert_array_equal(np.asarray(out["gt_disp"]), np.asarray(gt))


def test_augment_stereo_flip_uses_right_gt():
    l, r, gt, valid = _pair()
    gt_r = gt + 1.0
    batch = {
        "left": l,
        "right": r,
        "gt_disp": gt,
        "valid": valid,
        "gt_disp_right": gt_r,
        "valid_right": valid,
    }
    out = augment.augment_stereo(
        jax.random.PRNGKey(0), batch, hflip_p=1.0, jitter_p=0.0
    )
    # p=1: every example flipped+swapped; new left = hflip(right), new GT
    # = hflip(right-view GT)
    np.testing.assert_array_equal(
        np.asarray(out["left"]), np.asarray(augment.hflip(r))
    )
    np.testing.assert_array_equal(
        np.asarray(out["gt_disp"]), np.asarray(gt_r[:, :, ::-1])
    )


def test_augment_stereo_selfsup_flips_and_keeps_clean_targets():
    l, r, _, _ = _pair()
    out = augment.augment_stereo(
        jax.random.PRNGKey(0), {"left": l, "right": r}, hflip_p=1.0, jitter_p=1.0
    )
    # no GT: flip active; clean targets are the flipped views pre-jitter
    np.testing.assert_array_equal(
        np.asarray(out["left_clean"]), np.asarray(augment.hflip(r))
    )
    # jittered input differs from clean target
    assert not np.allclose(np.asarray(out["left"]), np.asarray(out["left_clean"]))


def test_augment_stereo_jittable_with_crop():
    l, r, gt, valid = _pair(h=16, w=24)
    batch = {"left": l, "right": r, "gt_disp": gt, "valid": valid}
    fn = jax.jit(
        lambda k, b: augment.augment_stereo(k, b, crop_hw=(8, 12), jitter_p=1.0)
    )
    out = fn(jax.random.PRNGKey(0), batch)
    assert out["left"].shape == (4, 8, 12, 3)
    assert out["gt_disp"].shape == (4, 8, 12)
    o = np.asarray(out["left"])
    assert o.min() >= 0.0 and o.max() <= 1.0


# ---------------------------------------------------------------------------
# Temporal (triplet) augmentation — VERDICT r4 missing-#3.
# ---------------------------------------------------------------------------


def _triplet(b=2, h=16, w=24, seed=5):
    rng = np.random.default_rng(seed)
    frames = jnp.asarray(
        rng.uniform(0, 1, (b, 3, h, w, 3)).astype(np.float32)
    )
    k = jnp.asarray(
        np.stack(
            [
                np.array(
                    [[20.0, 0, 8.3 + i], [0, 20.0, 7.1], [0, 0, 1]],
                    np.float32,
                )
                for i in range(b)
            ]
        )
    )
    return frames, k


def test_augment_temporal_flip_mirrors_cx():
    frames, k = _triplet()
    w = frames.shape[3]
    clean, aug, k_new = augment.augment_temporal(
        jax.random.PRNGKey(0), frames, k, hflip_p=1.0, jitter_p=0.0
    )
    np.testing.assert_array_equal(
        np.asarray(clean), np.asarray(frames)[:, :, :, ::-1]
    )
    np.testing.assert_array_equal(np.asarray(aug), np.asarray(clean))
    np.testing.assert_allclose(
        np.asarray(k_new[:, 0, 2]), (w - 1.0) - np.asarray(k[:, 0, 2])
    )
    # fx/fy/cy untouched
    np.testing.assert_array_equal(
        np.asarray(k_new[:, 1:]), np.asarray(k[:, 1:])
    )
    # p=0: no flip, K unchanged
    clean0, _, k0 = augment.augment_temporal(
        jax.random.PRNGKey(0), frames, k, hflip_p=0.0, jitter_p=0.0
    )
    np.testing.assert_array_equal(np.asarray(clean0), np.asarray(frames))
    np.testing.assert_array_equal(np.asarray(k0), np.asarray(k))


def test_augment_temporal_shared_jitter_across_frames():
    """ONE jitter draw per example, applied to all three frames: a
    per-frame draw would make photometry a spurious temporal cue for
    PoseNet."""
    rng = np.random.default_rng(7)
    one = rng.uniform(0, 1, (2, 1, 16, 24, 3)).astype(np.float32)
    frames = jnp.asarray(np.repeat(one, 3, axis=1))  # identical frames
    k = jnp.tile(jnp.eye(3), (2, 1, 1))
    clean, aug, _ = jax.jit(
        lambda key, f, kk: augment.augment_temporal(
            key, f, kk, hflip_p=0.0, jitter_p=1.0
        )
    )(jax.random.PRNGKey(1), frames, k)
    a = np.asarray(aug)
    # identical inputs + shared factors => identical jittered frames
    np.testing.assert_array_equal(a[:, 0], a[:, 1])
    np.testing.assert_array_equal(a[:, 0], a[:, 2])
    # jitter actually did something, targets stay clean
    assert not np.allclose(a, np.asarray(clean))
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(frames))
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_augment_temporal_flip_warp_equivariance():
    """The geometric consistency proof behind cx' = (W-1) - cx: warping
    the FLIPPED source with the mirrored intrinsics and the mirrored
    pose M4·T·M4 reproduces the flip of the original warp exactly (the
    flipped triplet is the same rigid scene mirrored — so the
    self-supervised objective is equally well-posed after the flip)."""
    from scenedepthestimation_tpu.ops import project

    b, h, w = 2, 16, 24
    rng = np.random.default_rng(3)
    depth = jnp.asarray(
        (5.0 + rng.uniform(0, 1, (b, h, w))).astype(np.float32)
    )
    src = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    k = jnp.asarray(
        np.stack(
            [
                np.array([[20.0, 0, 8.3], [0, 20.0, 7.1], [0, 0, 1]], np.float32)
            ]
            * b
        )
    )
    t = project.pose_vec_to_mat(
        jnp.asarray([[0.02, -0.01, 0.03]] * b, jnp.float32),
        jnp.asarray([[0.05, 0.02, -0.04]] * b, jnp.float32),
    )
    m4 = jnp.asarray(np.diag([-1.0, 1.0, 1.0, 1.0]).astype(np.float32))
    t_f = jnp.einsum("ij,bjk,kl->bil", m4, t, m4)
    k_f = k.at[:, 0, 2].set((w - 1.0) - k[:, 0, 2])

    rec, mask = project.reproject_sample(
        src, depth, k, jnp.linalg.inv(k), t
    )
    rec_f, mask_f = project.reproject_sample(
        src[:, :, ::-1], depth[:, :, ::-1], k_f, jnp.linalg.inv(k_f), t_f
    )
    m = np.asarray(mask)[:, :, ::-1] * np.asarray(mask_f)
    np.testing.assert_allclose(
        np.asarray(rec_f) * m[..., None],
        np.asarray(rec)[:, :, ::-1] * m[..., None],
        atol=2e-5,
    )
    np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask)[:, :, ::-1])
