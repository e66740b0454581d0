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
