"""KITTI odometry dataset + pose-ATE evaluation (SURVEY C15/C20-family;
monodepth2-lineage snippet-ATE protocol, grade E2)."""

import dataclasses

import numpy as np
import pytest

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.data.odometry import (
    KittiOdometryDataset,
    pair_batches,
    read_odometry_calib,
    read_poses_file,
)
from scenedepthestimation_tpu.utils import metrics as M


def _trajectory(n, step=1.0, yaw_step=0.02):
    """Smooth forward-and-turn cam-to-world trajectory, (n, 4, 4)."""
    poses = []
    pose = np.eye(4)
    for i in range(n):
        poses.append(pose.copy())
        c, s = np.cos(yaw_step), np.sin(yaw_step)
        rot = np.array(
            [[c, 0, s, 0], [0, 1, 0, 0], [-s, 0, c, 0], [0, 0, 0, 1]]
        )
        trans = np.eye(4)
        trans[2, 3] = step
        pose = pose @ rot @ trans
    return np.stack(poses)


def _write_poses(path, poses):
    rows = poses[:, :3, :].reshape(len(poses), 12)
    with open(path, "w") as f:
        for r in rows:
            f.write(" ".join(f"{v:.9e}" for v in r) + "\n")


def _make_odometry_tree(tmp_path, n=6, hw=(40, 64), seq="09"):
    from PIL import Image

    seq_dir = tmp_path / "sequences" / seq
    (seq_dir / "image_2").mkdir(parents=True)
    (tmp_path / "poses").mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, size=(*hw, 3), dtype=np.uint8)
        Image.fromarray(arr).save(seq_dir / "image_2" / f"{i:06d}.png")
    poses = _trajectory(n)
    _write_poses(tmp_path / "poses" / f"{seq}.txt", poses)
    with open(seq_dir / "calib.txt", "w") as f:
        p = "7.070912e+02 0 6.018873e+02 4.688783e+01 0 7.070912e+02 1.831104e+02 1.178601e-01 0 0 1 6.203223e-03"
        for name in ("P0", "P1", "P2", "P3"):
            f.write(f"{name}: {p}\n")
    return poses


def test_read_poses_file_roundtrip(tmp_path):
    poses = _trajectory(5)
    _write_poses(tmp_path / "09.txt", poses)
    out = read_poses_file(str(tmp_path / "09.txt"))
    assert out.shape == (5, 4, 4)
    np.testing.assert_allclose(out, poses, atol=1e-7)
    np.testing.assert_allclose(out[:, 3], np.tile([0.0, 0, 0, 1], (5, 1)))


def test_odometry_dataset_and_calib(tmp_path):
    poses = _make_odometry_tree(tmp_path, n=4)
    ds = KittiOdometryDataset(root=str(tmp_path), sequence="09")
    assert len(ds) == 4
    sample = ds[1]
    assert sample["image"].shape == (40, 64, 3)
    assert sample["index"] == 1
    np.testing.assert_allclose(ds.gt_poses(), poses, atol=1e-7)
    calib = ds.calib()
    assert calib is not None and calib["P2"].shape == (3, 4)
    assert calib["P2"][0, 0] == pytest.approx(707.0912)


def test_pair_batches_overlap_and_padding(tmp_path):
    _make_odometry_tree(tmp_path, n=6)
    ds = KittiOdometryDataset(root=str(tmp_path), sequence="09")
    batches = list(pair_batches(ds, batch_size=4))
    # 5 pairs → one full batch of 4 + one padded batch with 1 real.
    assert len(batches) == 2
    assert batches[0]["pairs"].shape == (4, 2, 40, 64, 3)
    assert batches[0]["n_real"] == 4
    assert batches[1]["n_real"] == 1
    # Pair k = (frame k, frame k+1): consecutive pairs share a frame.
    np.testing.assert_array_equal(
        batches[0]["pairs"][0, 1], batches[0]["pairs"][1, 0]
    )
    # Padding repeats the final real pair.
    np.testing.assert_array_equal(
        batches[1]["pairs"][1], batches[1]["pairs"][0]
    )


def test_accumulate_relative_poses_recovers_trajectory():
    g = _trajectory(7)
    xyz = M.accumulate_poses(M.relative_poses(g))
    # Accumulation starts at identity = camera-0 frame: positions are
    # inv(G0) @ Gi translations (here G0 = I, so the raw trajectory).
    expect = np.stack([(np.linalg.inv(g[0]) @ gi)[:3, 3] for gi in g])
    np.testing.assert_allclose(xyz, expect, atol=1e-9)


def test_compute_ate_zero_for_exact_and_scaled():
    g = _trajectory(5)
    xyz = M.accumulate_poses(M.relative_poses(g))
    assert M.compute_ate(xyz, xyz) == pytest.approx(0.0, abs=1e-12)
    # Least-squares scale alignment absorbs a global scale.
    assert M.compute_ate(xyz, 0.37 * xyz) == pytest.approx(0.0, abs=1e-9)
    # A known offset on one point: RMSE over the 5 positions.
    pred = xyz.copy()
    pred[2] += np.array([0.0, 3.0, 0.0])  # y is untouched by this xz path
    ate = M.compute_ate(xyz, pred)
    assert 0.0 < ate <= 3.0 / np.sqrt(5) + 1e-6


def test_snippet_ates_perfect_prediction_is_zero():
    g = _trajectory(9)
    local = M.relative_poses(g)  # cam-to-world steps
    pred = np.linalg.inv(local)  # the network's T_{(i+1)<-i} convention
    ates = M.snippet_ates(g, pred, track_length=5)
    # 9 frames → 8 local steps → 8 - 4 + 1 = 5 overlapping 5-frame windows.
    assert ates.shape == (5,)
    np.testing.assert_allclose(ates, 0.0, atol=1e-9)


def test_snippet_ates_rejects_length_mismatch():
    g = _trajectory(5)
    with pytest.raises(ValueError):
        M.snippet_ates(g, np.tile(np.eye(4), (2, 1, 1)))


def test_eval_pose_dataset_end_to_end(tmp_path):
    from scenedepthestimation_tpu.evaluate import eval_pose_dataset

    _make_odometry_tree(tmp_path, n=6, hw=(40, 64))
    ds = KittiOdometryDataset(root=str(tmp_path), sequence="09")
    cfg = configs.get("mono_kitti_192x640_fp32")
    cfg = dataclasses.replace(
        cfg, mono=dataclasses.replace(cfg.mono, height=32, width=64)
    )
    out = eval_pose_dataset(None, ds, cfg, batch_size=2, track_length=5)
    # 6 frames → 5 local steps → 5 - 4 + 1 = 2 overlapping 5-frame windows.
    assert out["n_frames"] == 6
    assert out["n_snippets"] == 2
    assert np.isfinite(out["ate_mean"]) and out["ate_mean"] > 0


def test_eval_pose_dataset_max_items(tmp_path):
    from scenedepthestimation_tpu.evaluate import eval_pose_dataset

    _make_odometry_tree(tmp_path, n=8, hw=(40, 64))
    ds = KittiOdometryDataset(root=str(tmp_path), sequence="09")
    cfg = configs.get("mono_kitti_192x640_fp32")
    cfg = dataclasses.replace(
        cfg, mono=dataclasses.replace(cfg.mono, height=32, width=64)
    )
    out = eval_pose_dataset(
        None, ds, cfg, batch_size=3, max_items=5, track_length=3
    )
    assert out["n_frames"] == 5
    assert out["n_snippets"] == 3


def test_run_eval_odom_requires_gt(tmp_path):
    from scenedepthestimation_tpu import evaluate

    _make_odometry_tree(tmp_path, n=4, seq="11")
    (tmp_path / "poses" / "11.txt").unlink()
    ds = KittiOdometryDataset(root=str(tmp_path), sequence="11")
    assert ds.gt_poses() is None
    cfg = configs.get("mono_kitti_192x640_fp32")
    with pytest.raises(ValueError, match="no GT poses"):
        evaluate.eval_pose_dataset(None, ds, cfg, batch_size=2)
