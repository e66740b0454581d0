"""run_eval + predict_batch wiring tests over on-disk synthetic trees."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from scenedepthestimation_tpu import evaluate
from scenedepthestimation_tpu.api import load_weights, predict_batch
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig
from scenedepthestimation_tpu.parallel.mesh import make_mesh

TINY = RunConfig(
    name="tiny_runeval", pipeline="mono", batch_size=2,
    mono=MonoConfig(height=32, width=64),
)


def _make_tree(tmp_path, n=3, hw=(32, 96)):
    root = tmp_path / "kitti"
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    rng = np.random.default_rng(0)
    os.makedirs(root / "2011_09_26", exist_ok=True)
    r = np.eye(3).reshape(-1)
    p2 = [100.0, 0, 48, 0, 0, 100.0, 16, 0, 0, 0, 1, 0]
    p3 = list(p2)
    p3[3] = -53.9
    (root / "2011_09_26" / "calib_cam_to_cam.txt").write_text(
        "R_rect_00: " + " ".join(map(str, r)) + "\n"
        "P_rect_02: " + " ".join(map(str, p2)) + "\n"
        "P_rect_03: " + " ".join(map(str, p3)) + "\n"
    )
    rv = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    (root / "2011_09_26" / "calib_velo_to_cam.txt").write_text(
        "R: " + " ".join(map(str, rv.reshape(-1))) + "\nT: 0 0 0\n"
    )
    lines = []
    for i in range(n):
        img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        d = root / drive / "image_02" / "data"
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(d / f"{i:010d}.png")
        pts = np.stack(
            [rng.uniform(5, 50, 200), rng.uniform(-4, 4, 200),
             rng.uniform(-1, 1, 200), np.ones(200)], 1
        ).astype(np.float32)
        vd = root / drive / "velodyne_points" / "data"
        os.makedirs(vd, exist_ok=True)
        pts.tofile(vd / f"{i:010d}.bin")
        lines.append(f"{drive} {i} l")
    os.makedirs(root / "splits" / "eigen", exist_ok=True)
    (root / "splits" / "eigen" / "test_files.txt").write_text(
        "\n".join(lines) + "\n"
    )
    return str(root)


def test_run_eval_eigen_wiring(tmp_path):
    root = _make_tree(tmp_path)
    out = evaluate.run_eval(
        config=TINY, data_root=root, split="eigen", max_items=3
    )
    assert out["count"] == 3
    assert np.isfinite(out["abs_rel"])


def test_export_gt_roundtrip(tmp_path):
    """export-gt then eval with gt='npz' reproduces the velodyne-mode
    metrics exactly (same projection, precomputed)."""
    from scenedepthestimation_tpu.data.kitti import (
        KittiRawDataset,
        export_gt_depths,
    )

    root = _make_tree(tmp_path)
    sf = os.path.join(root, "splits", "eigen", "test_files.txt")
    out = str(tmp_path / "gt_depths.npz")
    n = export_gt_depths(root=root, split_file=sf, out_path=out)
    assert n == 3

    ds_velo = KittiRawDataset(root=root, split_file=sf, gt="velodyne")
    ds_npz = KittiRawDataset(root=root, split_file=sf, gt="npz", gt_root=out)
    for i in range(3):
        np.testing.assert_array_equal(
            ds_velo[i]["gt_depth"], ds_npz[i]["gt_depth"]
        )

    m_velo = evaluate.run_eval(
        config=TINY, data_root=root, split="eigen", max_items=3
    )
    m_npz = evaluate.run_eval(
        config=TINY, data_root=root, split="eigen", max_items=3,
        gt="npz", gt_root=out,
    )
    for k, v in m_velo.items():
        assert m_npz[k] == pytest.approx(v, rel=1e-6), k


def test_npz_gt_length_mismatch(tmp_path):
    from scenedepthestimation_tpu.data.kitti import KittiRawDataset

    root = _make_tree(tmp_path)
    sf = os.path.join(root, "splits", "eigen", "test_files.txt")
    arr = np.empty(2, dtype=object)  # 2 maps for a 3-entry split
    arr[:] = [np.zeros((4, 4), np.float32)] * 2
    bad = str(tmp_path / "bad.npz")
    np.savez_compressed(bad, data=arr)
    with pytest.raises(ValueError, match="wrong split"):
        KittiRawDataset(root=root, split_file=sf, gt="npz", gt_root=bad)


def test_run_eval_unknown_split(tmp_path):
    with pytest.raises(ValueError, match="unknown split"):
        evaluate.run_eval(config=TINY, data_root=str(tmp_path), split="wat")


def test_predict_batch_wrapper_with_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    predictor = load_weights(None, TINY, seed=0)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 256, (8, 32, 64, 3), dtype=np.uint8)
               for _ in range(2)]
    results = predict_batch(predictor, batches, mesh=mesh)
    assert len(results) == 2
    assert results[0]["depth"].shape == (8, 32, 64)
    assert np.isfinite(results[0]["depth"]).all()
