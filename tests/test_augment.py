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
