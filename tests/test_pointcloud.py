"""Point-cloud export (utils/pointcloud.py): back-projection geometry,
PLY format round-trip, and the predict CLI wiring (SURVEY §2 C19 dump
surface)."""

import struct

import numpy as np
import pytest

from scenedepthestimation_tpu.utils.pointcloud import (
    backproject_depth,
    default_intrinsics,
    depth_to_pointcloud_ply,
    normals_from_depth,
    normals_to_rgb,
    write_ply,
)


def test_backproject_geometry():
    # Constant-depth plane: the principal-point pixel back-projects to
    # (0, 0, Z); one pixel right of it moves X by Z/fx.
    h, w, z = 8, 12, 5.0
    fx, fy, cx, cy = 100.0, 50.0, 6.0, 4.0
    pts = backproject_depth(np.full((h, w), z, np.float32), fx, fy, cx, cy)
    assert pts.shape == (h, w, 3)
    np.testing.assert_allclose(pts[4, 6], [0.0, 0.0, z], atol=1e-6)
    np.testing.assert_allclose(pts[4, 7], [z / fx, 0.0, z], atol=1e-6)
    np.testing.assert_allclose(pts[5, 6], [0.0, z / fy, z], atol=1e-6)
    # Depth scales the ray linearly.
    pts2 = backproject_depth(
        np.full((h, w), 2 * z, np.float32), fx, fy, cx, cy
    )
    np.testing.assert_allclose(pts2[..., :2], 2 * pts[..., :2], atol=1e-5)


def test_default_intrinsics_monodepth2_convention():
    k = default_intrinsics(192, 640)
    assert k["fx"] == pytest.approx(0.58 * 640)
    assert k["fy"] == pytest.approx(1.92 * 192)
    assert k["cx"] == pytest.approx(320.0)
    assert k["cy"] == pytest.approx(96.0)


def _read_ply_binary(path):
    with open(path, "rb") as f:
        data = f.read()
    head, _, body = data.partition(b"end_header\n")
    lines = head.decode("ascii").splitlines()
    assert lines[0] == "ply"
    n = int(next(l for l in lines if l.startswith("element vertex")).split()[-1])
    props = [l.split()[-1] for l in lines if l.startswith("property")]
    return lines, props, n, body


def test_write_ply_binary_roundtrip(tmp_path):
    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    col = np.arange(12, dtype=np.uint8).reshape(4, 3) * 10
    path = str(tmp_path / "cloud.ply")
    n = write_ply(path, pts, col)
    assert n == 4
    lines, props, n_hdr, body = _read_ply_binary(path)
    assert "format binary_little_endian 1.0" in lines
    assert props == ["x", "y", "z", "red", "green", "blue"]
    assert n_hdr == 4 and len(body) == 4 * (12 + 3)
    x0, y0, z0 = struct.unpack("<3f", body[:12])
    np.testing.assert_allclose([x0, y0, z0], pts[0])
    assert tuple(body[12:15]) == tuple(col[0])
    # Last vertex survives the interleave.
    off = 3 * 15
    np.testing.assert_allclose(struct.unpack("<3f", body[off : off + 12]), pts[3])


def test_write_ply_ascii(tmp_path):
    path = str(tmp_path / "cloud_ascii.ply")
    write_ply(path, np.ones((2, 3), np.float32), binary=False)
    text = open(path, "rb").read().decode("ascii")
    assert "format ascii 1.0" in text
    assert text.strip().splitlines()[-1] == "1.000000 1.000000 1.000000"


def test_depth_to_pointcloud_filters_and_colors(tmp_path):
    h, w = 6, 8
    depth = np.full((h, w), 10.0, np.float32)
    depth[0, 0] = 0.0  # invalid
    depth[0, 1] = 200.0  # beyond the far cap
    depth[0, 2] = np.inf
    img = np.full((h, w, 3), 128, np.uint8)
    path = str(tmp_path / "d.ply")
    n = depth_to_pointcloud_ply(path, depth, image=img, max_depth=80.0)
    assert n == h * w - 3
    _, props, n_hdr, body = _read_ply_binary(path)
    assert n_hdr == n and "red" in props


def test_normals_frontoparallel_plane():
    # Constant depth: every normal faces the camera, (0, 0, -1).
    intr = {"fx": 100.0, "fy": 100.0, "cx": 8.0, "cy": 6.0}
    n = normals_from_depth(np.full((12, 16), 7.0, np.float32), intr)
    assert n.shape == (12, 16, 3)
    np.testing.assert_allclose(n, np.broadcast_to([0, 0, -1.0], n.shape), atol=1e-5)


def test_normals_tilted_plane():
    # Plane z = z0 + k·X in camera coords ⇒ depth z(u) = z0/(1 − k(u−cx)/fx);
    # analytic unit normal oriented toward the camera: (k, 0, −1)/√(1+k²).
    h, w = 12, 16
    intr = {"fx": 200.0, "fy": 200.0, "cx": w / 2.0, "cy": h / 2.0}
    k, z0 = 0.3, 5.0
    u = np.arange(w, dtype=np.float32)[None, :]
    depth = np.broadcast_to(
        z0 / (1.0 - k * (u - intr["cx"]) / intr["fx"]), (h, w)
    ).astype(np.float32)
    n = normals_from_depth(depth, intr)
    expected = np.array([k, 0.0, -1.0]) / np.sqrt(1 + k * k)
    # Interior only: np.gradient's one-sided edges are exact for this
    # plane too, but keep the assertion on the central-difference region.
    np.testing.assert_allclose(
        n[1:-1, 1:-1], np.broadcast_to(expected, n[1:-1, 1:-1].shape), atol=1e-3
    )


def test_normals_to_rgb_mapping():
    rgb = normals_to_rgb(np.array([[[0.0, 0.0, -1.0]]], np.float32))
    assert rgb.dtype == np.uint8
    assert tuple(rgb[0, 0]) == (128, 128, 0)


def test_cli_predict_ply(tmp_path, monkeypatch):
    """End-to-end: `scenedepth predict --ply` on a tiny random-weight
    mono config writes a loadable colored PLY next to the depth dump."""
    from PIL import Image

    from scenedepthestimation_tpu import configs
    from scenedepthestimation_tpu.cli import main
    from scenedepthestimation_tpu.configs import MonoConfig, RunConfig

    tiny = RunConfig(
        name="mono_tiny_test",
        pipeline="mono",
        mono=MonoConfig(height=64, width=128),
    )
    monkeypatch.setitem(configs.PRESETS, tiny.name, tiny)

    img_path = str(tmp_path / "frame.png")
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, size=(64, 128, 3), dtype=np.uint8)
    ).save(img_path)
    ply_path = str(tmp_path / "frame.ply")
    normals_path = str(tmp_path / "frame_normals.png")
    rc = main(
        [
            "predict",
            "--config",
            "mono_tiny_test",
            "--image",
            img_path,
            "--output",
            str(tmp_path / "out"),
            "--ply",
            ply_path,
            "--normals",
            normals_path,
        ]
    )
    assert rc == 0
    _, props, n_hdr, body = _read_ply_binary(ply_path)
    # Random-weight depth is finite and positive; most points survive
    # the 80 m cap, and the source PNG colors ride along.
    assert n_hdr > 0 and props[:3] == ["x", "y", "z"] and "red" in props
    assert len(body) == n_hdr * 15
    with Image.open(normals_path) as im:
        assert im.size == (128, 64) and im.mode == "RGB"


def test_write_ply_float_colors_scaled(tmp_path):
    """ADVICE r3: a float [0,1] RGB image must scale to 0-255, not
    truncate to {0,1} (near-black cloud)."""
    pts = np.zeros((2, 3), np.float32)
    col01 = np.array([[1.0, 0.5, 0.0], [0.25, 0.75, 1.0]], np.float32)
    path = str(tmp_path / "f01.ply")
    write_ply(path, pts, col01)
    _, _, _, body = _read_ply_binary(path)
    assert tuple(body[12:15]) == (255, 128, 0)
    # 0-255 floats round instead of rescaling.
    path2 = str(tmp_path / "f255.ply")
    write_ply(path2, pts, col01 * 255.0)
    _, _, _, body2 = _read_ply_binary(path2)
    assert tuple(body2[12:15]) == (255, 128, 0)


def test_write_ply_int_colors_range_checked(tmp_path):
    pts = np.zeros((1, 3), np.float32)
    with pytest.raises(ValueError, match=r"\[0, 255\]"):
        write_ply(str(tmp_path / "bad.ply"), pts, np.array([[300, 0, 0]]))
    # In-range non-uint8 ints cast cleanly.
    write_ply(str(tmp_path / "ok.ply"), pts, np.array([[1, 2, 3]], np.int64))


def test_cli_predict_ply_calib_rescale(tmp_path, monkeypatch, capsys):
    """--calib-dir intrinsics rescale from the calib's S_rect resolution
    to the predicted depth's resolution, and --normals shares them
    (ADVICE r3 medium + low)."""
    from PIL import Image

    from scenedepthestimation_tpu import configs
    from scenedepthestimation_tpu.cli import main
    from scenedepthestimation_tpu.configs import MonoConfig, RunConfig

    tiny = RunConfig(
        name="mono_tiny_test2",
        pipeline="mono",
        mono=MonoConfig(height=64, width=128),
    )
    monkeypatch.setitem(configs.PRESETS, tiny.name, tiny)

    calib = tmp_path / "calib"
    calib.mkdir()
    r = " ".join(map(str, np.eye(3).reshape(-1)))
    (calib / "calib_cam_to_cam.txt").write_text(
        "S_rect_02: 512 256\n"
        f"R_rect_00: {r}\n"
        "P_rect_02: 400.0 0 256 0 0 400.0 128 0 0 0 1 0\n"
        "P_rect_03: 400.0 0 256 -216.0 0 400.0 128 0 0 0 1 0\n"
    )
    img_path = str(tmp_path / "frame.png")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (64, 128, 3), dtype=np.uint8)
    ).save(img_path)
    rc = main(
        [
            "predict", "--config", "mono_tiny_test2",
            "--image", img_path,
            "--output", str(tmp_path / "out"),
            "--ply", str(tmp_path / "c.ply"),
            "--normals", str(tmp_path / "n.png"),
            "--calib-dir", str(calib),
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "rescaled from rectified 512x256 to depth 128x64" in err


def test_kitti_intrinsics_s_rect(tmp_path):
    from scenedepthestimation_tpu.data.io import kitti_intrinsics

    r = " ".join(map(str, np.eye(3).reshape(-1)))
    (tmp_path / "calib_cam_to_cam.txt").write_text(
        "S_rect_02: 1242 375\n"
        f"R_rect_00: {r}\n"
        "P_rect_02: 721.5 0 609.6 44.9 0 721.5 172.9 0 0 0 1 0\n"
        "P_rect_03: 721.5 0 609.6 -339.5 0 721.5 172.9 0 0 0 1 0\n"
    )
    k = kitti_intrinsics(str(tmp_path))
    assert k["width_px"] == 1242.0 and k["height_px"] == 375.0
    # Calibs without S_rect simply omit the keys (synthetic-test calibs).
    (tmp_path / "calib_cam_to_cam.txt").write_text(
        f"R_rect_00: {r}\n"
        "P_rect_02: 721.5 0 609.6 44.9 0 721.5 172.9 0 0 0 1 0\n"
        "P_rect_03: 721.5 0 609.6 -339.5 0 721.5 172.9 0 0 0 1 0\n"
    )
    k2 = kitti_intrinsics(str(tmp_path))
    assert "width_px" not in k2
