"""Data-layer tests (SURVEY C1, C3-C5) over synthetic on-disk fixtures."""

import os

import numpy as np
import pytest
from PIL import Image

from scenedepthestimation_tpu.data import io


def _write_png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def _write_png16(path, arr_float, scale=256.0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    u16 = (arr_float * scale).astype(np.uint16)
    Image.fromarray(u16, mode="I;16").save(path)


# ---------------------------------------------------------------------------
# io
# ---------------------------------------------------------------------------


def test_load_depth_png16_roundtrip(tmp_path):
    depth = np.array([[0.0, 1.5], [80.0, 20.25]], np.float32)
    p = str(tmp_path / "d.png")
    _write_png16(p, depth)
    out = io.load_depth_png16(p)
    np.testing.assert_allclose(out, depth, atol=1 / 256.0)


def test_load_depth_png16_rejects_8bit(tmp_path):
    p = str(tmp_path / "bad.png")
    _write_png(p, np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError, match="16-bit"):
        io.load_depth_png16(p)


def _make_calib(tmp_path):
    """Identity-ish calibration: camera at velodyne origin, f=100, c=(48,16)."""
    os.makedirs(tmp_path, exist_ok=True)
    cam2cam = tmp_path / "calib_cam_to_cam.txt"
    r = np.eye(3).reshape(-1)
    p2 = np.array([100.0, 0, 48, 0, 0, 100.0, 16, 0, 0, 0, 1, 0])
    p3 = p2.copy()
    p3[3] = -53.9  # tx = -fx * baseline → baseline 0.539 m
    cam2cam.write_text(
        "R_rect_00: " + " ".join(map(str, r)) + "\n"
        "P_rect_02: " + " ".join(map(str, p2)) + "\n"
        "P_rect_03: " + " ".join(map(str, p3)) + "\n"
    )
    velo2cam = tmp_path / "calib_velo_to_cam.txt"
    # velodyne x-forward → camera z-forward: R maps (x,y,z)->(−y,−z,x)
    rv = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float64)
    velo2cam.write_text(
        "R: " + " ".join(map(str, rv.reshape(-1))) + "\nT: 0 0 0\n"
    )


def test_velodyne_projection(tmp_path):
    _make_calib(tmp_path)
    # One point 10 m ahead, slightly left/up in velo coords.
    pts = np.array([[10.0, 0.0, 0.0, 1.0]], np.float32)  # straight ahead
    velo = tmp_path / "scan.bin"
    pts.astype(np.float32).tofile(velo)
    depth = io.velodyne_to_depth(str(velo), str(tmp_path), cam=2, image_hw=(32, 96))
    # Straight ahead → principal point (u=48, v=16) minus the devkit's
    # 1-based→0-based pixel correction (KITTI MATLAB convention).
    assert depth[15, 47] == pytest.approx(10.0, abs=1e-4)
    assert (depth > 0).sum() == 1


def test_velodyne_projection_min_depth_wins(tmp_path):
    _make_calib(tmp_path)
    pts = np.array(
        [[10.0, 0.0, 0.0, 1.0], [5.0, 0.0, 0.0, 1.0]], np.float32
    )  # same ray, two depths
    velo = tmp_path / "scan.bin"
    pts.tofile(velo)
    depth = io.velodyne_to_depth(str(velo), str(tmp_path), cam=2, image_hw=(32, 96))
    assert depth[15, 47] == pytest.approx(5.0, abs=1e-4)


def test_kitti_intrinsics(tmp_path):
    _make_calib(tmp_path)
    intr = io.kitti_intrinsics(str(tmp_path))
    assert intr["focal_px"] == pytest.approx(100.0)
    assert intr["baseline_m"] == pytest.approx(0.539, abs=1e-6)


# ---------------------------------------------------------------------------
# KITTI raw dataset
# ---------------------------------------------------------------------------


def _make_kitti_raw(tmp_path, n=3, hw=(32, 96)):
    root = tmp_path / "kitti"
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    rng = np.random.default_rng(0)
    lines = []
    _make_calib(root / "2011_09_26")
    for i in range(n):
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        _write_png(str(root / drive / "image_02" / "data" / f"{i:010d}.png"), img)
        pts = np.array([[10.0 + i, 0.0, 0.0, 1.0]], np.float32)
        binp = root / drive / "velodyne_points" / "data" / f"{i:010d}.bin"
        os.makedirs(binp.parent, exist_ok=True)
        pts.tofile(binp)
        lines.append(f"{drive} {i} l")
    split = root / "split.txt"
    split.write_text("\n".join(lines) + "\n")
    return root, split


def test_kitti_raw_dataset(tmp_path):
    root, split = _make_kitti_raw(tmp_path)
    from scenedepthestimation_tpu.data.kitti import KittiRawDataset

    ds = KittiRawDataset(root=str(root), split_file=str(split), gt="velodyne")
    assert len(ds) == 3
    s = ds[1]
    assert s["image"].shape == (32, 96, 3)
    assert s["gt_depth"].shape == (32, 96)
    assert s["gt_depth"][15, 47] == pytest.approx(11.0, abs=1e-4)


def test_kitti_batching_pads_last(tmp_path):
    root, split = _make_kitti_raw(tmp_path, n=3)
    from scenedepthestimation_tpu.data.kitti import KittiRawDataset, batched

    ds = KittiRawDataset(root=str(root), split_file=str(split), gt="none")
    batches = list(batched(ds, batch_size=2))
    assert batches[0]["images"].shape == (2, 32, 96, 3)
    assert batches[0]["n_real"] == 2
    assert batches[1]["images"].shape == (2, 32, 96, 3)  # padded
    assert batches[1]["n_real"] == 1


# ---------------------------------------------------------------------------
# KITTI 2015
# ---------------------------------------------------------------------------


def _make_kitti2015(tmp_path, n=3, hw=(32, 96)):
    root = tmp_path / "k2015"
    rng = np.random.default_rng(1)
    for i in range(n):
        name = f"{i:06d}_10.png"
        for cam in ("image_2", "image_3"):
            _write_png(
                str(root / "training" / cam / name),
                rng.integers(0, 256, (*hw, 3), dtype=np.uint8),
            )
        disp = rng.uniform(1, 20, hw).astype(np.float32)
        disp[0, :] = 0  # invalid row
        _write_png16(str(root / "training" / "disp_occ_0" / name), disp)
    return root


def test_kitti2015_dataset(tmp_path):
    root = _make_kitti2015(tmp_path)
    from scenedepthestimation_tpu.data.kitti2015 import Kitti2015Dataset, batched

    ds = Kitti2015Dataset(root=str(root))
    assert len(ds) == 3
    s = ds[0]
    assert s["left"].shape == (32, 96, 3)
    assert s["gt_disp"].shape == (32, 96)
    assert not s["valid"][0].any() and s["valid"][5].all()

    b = next(iter(batched(ds, 2)))
    assert b["left"].shape == (2, 32, 96, 3)
    assert b["gt_disp"].shape == (2, 32, 96)


# ---------------------------------------------------------------------------
# NYU
# ---------------------------------------------------------------------------


def test_nyu_dataset_png_layout(tmp_path):
    root = tmp_path / "nyu"
    rng = np.random.default_rng(2)
    for i in range(2):
        _write_png(
            str(root / "rgb" / f"{i:04d}.png"),
            rng.integers(0, 256, (48, 64, 3), dtype=np.uint8),
        )
        depth_mm = (rng.uniform(0.5, 9.5, (48, 64)) * 1000).astype(np.uint16)
        os.makedirs(root / "depth", exist_ok=True)
        Image.fromarray(depth_mm, mode="I;16").save(root / "depth" / f"{i:04d}.png")
    from scenedepthestimation_tpu.data.nyu import NyuDataset

    ds = NyuDataset(root=str(root))
    assert len(ds) == 2
    s = ds[0]
    assert s["image"].shape == (48, 64, 3)
    assert s["gt_depth"].shape == (48, 64)
    assert 0.4 < s["gt_depth"].mean() < 10.0


def test_kitti_load_pair(tmp_path):
    root, split = _make_kitti_raw(tmp_path, n=1)
    # add the right-camera frame
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    rng = np.random.default_rng(9)
    _write_png(
        str(root / drive / "image_03" / "data" / f"{0:010d}.png"),
        rng.integers(0, 256, (32, 96, 3), dtype=np.uint8),
    )
    from scenedepthestimation_tpu.data.kitti import KittiRawDataset

    ds = KittiRawDataset(root=str(root), split_file=str(split), gt="none",
                         load_pair=True)
    s = ds[0]
    assert s["pair_image"].shape == (32, 96, 3)
    assert s["intrinsics"]["focal_px"] == pytest.approx(100.0)


def test_kitti_improved_gt(tmp_path):
    root, split = _make_kitti_raw(tmp_path, n=1)
    drive = "2011_09_26_drive_0002_sync"
    rng = np.random.default_rng(11)
    gt = rng.uniform(1, 60, (32, 96)).astype(np.float32)
    _write_png16(
        str(
            tmp_path
            / "gt"
            / drive
            / "proj_depth"
            / "groundtruth"
            / "image_02"
            / f"{0:010d}.png"
        ),
        gt,
    )
    from scenedepthestimation_tpu.data.kitti import KittiRawDataset

    ds = KittiRawDataset(
        root=str(root),
        split_file=str(split),
        gt="improved",
        gt_root=str(tmp_path / "gt"),
    )
    s = ds[0]
    np.testing.assert_allclose(s["gt_depth"], gt, atol=1 / 256.0)
