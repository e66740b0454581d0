"""Native C++ PNG decoder vs PIL (SURVEY C1 native data-loader)."""

import numpy as np
import pytest
from PIL import Image

from scenedepthestimation_tpu.data import io as dio

pytestmark = pytest.mark.skipif(
    dio._native is None, reason="native extension not built"
)


def _photo(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = np.cumsum(rng.normal(0, 4, (h, w, 3)), axis=1)
    return ((base - base.min()) / np.ptp(base) * 255).astype(np.uint8)


def test_rgb_decode_bit_exact(tmp_path):
    img = _photo(93, 201)
    p = str(tmp_path / "x.png")
    Image.fromarray(img).save(p)
    np.testing.assert_array_equal(dio.load_image(p), img)


def test_gray16_decode_bit_exact(tmp_path):
    rng = np.random.default_rng(1)
    d = (rng.uniform(0, 80, (47, 111)) * 256).astype(np.uint16)
    p = str(tmp_path / "d.png")
    Image.fromarray(d, mode="I;16").save(p)
    np.testing.assert_allclose(
        dio.load_depth_png16(p), d.astype(np.float32) / 256
    )


def test_gray8_promoted_to_rgb(tmp_path):
    g = _photo(31, 57)[:, :, 0]
    p = str(tmp_path / "g.png")
    Image.fromarray(g).save(p)
    out = dio.load_image(p)
    assert out.shape == (31, 57, 3)
    np.testing.assert_array_equal(out[..., 0], g)


def test_rgba_alpha_dropped(tmp_path):
    img = _photo(20, 30)
    rgba = np.dstack([img, np.full((20, 30), 128, np.uint8)])
    p = str(tmp_path / "a.png")
    Image.fromarray(rgba).save(p)
    np.testing.assert_array_equal(dio.load_image(p), img)


def test_matches_pil_on_all_filter_types(tmp_path):
    """Exercise sub/up/avg/paeth by saving varied content; PIL oracle."""
    for seed in range(4):
        img = _photo(64, 64, seed=seed)
        p = str(tmp_path / f"f{seed}.png")
        Image.fromarray(img).save(p, optimize=bool(seed % 2))
        dio._FORCE_PIL = True
        want = dio.load_image(p)
        dio._FORCE_PIL = False
        np.testing.assert_array_equal(dio.load_image(p), want)


def test_native_raises_then_falls_back(tmp_path):
    """Unsupported PNG variant (palette) must silently use PIL."""
    img = Image.fromarray(_photo(16, 16)).quantize(colors=16)  # palette PNG
    p = str(tmp_path / "pal.png")
    img.save(p)
    out = dio.load_image(p)  # must not raise
    assert out.shape == (16, 16, 3)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="not a PNG"):
        dio._native.decode_png(b"definitely not a png")
