"""Evaluation metrics (SURVEY C15) — jit-compiled metric kernels.

* Monocular depth: abs_rel, sq_rel, RMSE, RMSE_log, δ<1.25^{1,2,3} under
  the Eigen protocol — Garg/Eigen crop, depth capped to [min, max], and
  optional per-image median scaling (SURVEY §3.3; E2-standard protocol,
  UNVERIFIED vs reference).
* Stereo disparity: EPE and D1-all (>3 px AND >5 % of GT).

abs_rel is the judged parity metric (BASELINE.json:2). All functions are
mask-based (no boolean indexing) so they jit with static shapes and run
on device.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from scenedepthestimation_tpu.configs import EvalConfig


def eigen_crop_mask(height: int, width: int, cfg: EvalConfig = EvalConfig()) -> jnp.ndarray:
    """(H, W) bool mask for the Garg/Eigen evaluation crop."""
    r0, r1, c0, c1 = cfg.eigen_crop
    rows = jnp.arange(height)
    cols = jnp.arange(width)
    row_ok = (rows >= jnp.floor(r0 * height)) & (rows < jnp.floor(r1 * height))
    col_ok = (cols >= jnp.floor(c0 * width)) & (cols < jnp.floor(c1 * width))
    return row_ok[:, None] & col_ok[None, :]


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis=None) -> jnp.ndarray:
    num = jnp.sum(jnp.where(mask, x, 0.0), axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis), 1)
    return num / den


def _masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x[mask] for a flattened per-image array (static shape).

    Invalid entries are pushed to +inf and the median is read at index
    (n_valid-1)//2 … n_valid//2 of the sorted array (even/odd averaged),
    matching ``np.median`` on the compacted values.
    """
    flat = jnp.where(mask, x, jnp.inf).reshape(-1)
    sorted_x = jnp.sort(flat)
    n = jnp.sum(mask).astype(jnp.int32)
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    return 0.5 * (sorted_x[lo] + sorted_x[hi])


def depth_errors(
    gt: jnp.ndarray, pred: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Standard 7 depth metrics over valid pixels of ONE image."""
    thresh = jnp.maximum(gt / jnp.maximum(pred, 1e-12), pred / jnp.maximum(gt, 1e-12))
    a1 = _masked_mean((thresh < 1.25).astype(jnp.float32), mask)
    a2 = _masked_mean((thresh < 1.25**2).astype(jnp.float32), mask)
    a3 = _masked_mean((thresh < 1.25**3).astype(jnp.float32), mask)

    diff = gt - pred
    rmse = jnp.sqrt(_masked_mean(diff**2, mask))
    safe_gt = jnp.maximum(gt, 1e-12)
    safe_pred = jnp.maximum(pred, 1e-12)
    rmse_log = jnp.sqrt(_masked_mean((jnp.log(safe_gt) - jnp.log(safe_pred)) ** 2, mask))
    abs_rel = _masked_mean(jnp.abs(diff) / safe_gt, mask)
    sq_rel = _masked_mean(diff**2 / safe_gt, mask)
    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        "a1": a1,
        "a2": a2,
        "a3": a3,
    }


def evaluate_depth_image(
    pred_depth: jnp.ndarray,
    gt_depth: jnp.ndarray,
    cfg: EvalConfig = EvalConfig(),
    apply_eigen_crop: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full monocular per-image protocol (SURVEY §3.3).

    ``pred_depth`` must already be at GT resolution. Valid = GT in
    (min_depth, max_depth) ∩ crop. With ``median_scaling`` the prediction
    is scaled by median(gt)/median(pred) over valid pixels, then clipped
    to [min_depth, max_depth].
    """
    h, w = gt_depth.shape
    mask = (gt_depth > cfg.min_depth) & (gt_depth < cfg.max_depth)
    if apply_eigen_crop:
        mask = mask & eigen_crop_mask(h, w, cfg)

    pred = pred_depth
    ratio = jnp.array(1.0, dtype=pred.dtype)
    if cfg.median_scaling:
        ratio = _masked_median(gt_depth, mask) / jnp.maximum(
            _masked_median(pred, mask), 1e-12
        )
        pred = pred * ratio
    pred = jnp.clip(pred, cfg.min_depth, cfg.max_depth)
    out = depth_errors(gt_depth, pred, mask)
    out["scale_ratio"] = ratio
    # Callers must skip images with no valid GT in the crop — the metric
    # values above degenerate to 0 (denominators clamp to 1) and would
    # silently dilute a dataset mean (ADVICE r1).
    out["n_valid"] = jnp.sum(mask).astype(jnp.int32)
    return out


# --- Pose / odometry metrics (SURVEY §2 C15-family; monodepth2-lineage
# snippet-ATE protocol, grade E2 — 5-frame tracks, first-position offset,
# least-squares scale alignment; UNVERIFIED vs the empty reference
# mount). These operate on handfuls of 4x4 matrices — host-side numpy is
# the right tool; there is nothing here for a TPU program to accelerate.


def relative_poses(global_poses) -> "np.ndarray":
    """(N, 4, 4) cam-to-world trajectory → (N-1, 4, 4) local steps.

    ``L_i = inv(G_i) @ G_{i+1}`` maps camera-(i+1) coordinates into
    camera-i coordinates — the per-frame cam-to-world increment that
    :func:`accumulate_poses` chains back into a trajectory.
    """
    import numpy as np

    g = np.asarray(global_poses, dtype=np.float64)
    return np.linalg.inv(g[:-1]) @ g[1:]


def accumulate_poses(local_poses) -> "np.ndarray":
    """(M, 4, 4) local cam-to-world steps → (M+1, 3) positions from I."""
    import numpy as np

    cam_to_world = np.eye(4)
    xyz = [cam_to_world[:3, 3].copy()]
    for step in np.asarray(local_poses, dtype=np.float64):
        cam_to_world = cam_to_world @ step
        xyz.append(cam_to_world[:3, 3].copy())
    return np.stack(xyz)


def compute_ate(gt_xyz, pred_xyz) -> float:
    """Absolute trajectory error of one snippet (family protocol):
    align the first positions, scale-align least-squares, RMSE."""
    import numpy as np

    gt = np.asarray(gt_xyz, dtype=np.float64)
    pred = np.asarray(pred_xyz, dtype=np.float64)
    pred = pred + (gt[0] - pred[0])[None]
    scale = np.sum(gt * pred) / max(np.sum(pred**2), 1e-12)
    return float(np.sqrt(np.mean(np.sum((scale * pred - gt) ** 2, axis=-1))))


def snippet_ates(
    gt_global_poses, pred_local_poses, track_length: int = 5
):
    """Per-snippet ATEs over every overlapping ``track_length``-frame
    window: GT trajectory from the poses file, predicted trajectory from
    the network's (N-1, 4, 4) frame-to-frame transforms ``T_{(i+1)<-i}``
    (the training convention of ``pose_vec_to_mat(..., invert=False)``;
    its inverse is the local cam-to-world step)."""
    import numpy as np

    pred_local = np.linalg.inv(np.asarray(pred_local_poses, dtype=np.float64))
    gt_local = relative_poses(gt_global_poses)
    if pred_local.shape[0] != gt_local.shape[0]:
        raise ValueError(
            f"{pred_local.shape[0]} predicted steps vs {gt_local.shape[0]} GT"
        )
    steps = track_length - 1
    ates = [
        compute_ate(
            accumulate_poses(gt_local[i : i + steps]),
            accumulate_poses(pred_local[i : i + steps]),
        )
        for i in range(gt_local.shape[0] - steps + 1)
    ]
    return np.asarray(ates)


def disparity_errors(
    pred_disp: jnp.ndarray,
    gt_disp: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: EvalConfig = EvalConfig(),
) -> Dict[str, jnp.ndarray]:
    """KITTI-2015 stereo metrics: EPE and D1-all over valid GT pixels."""
    err = jnp.abs(pred_disp - gt_disp)
    epe = _masked_mean(err, valid)
    bad = (err > cfg.d1_px) & (err > cfg.d1_frac * jnp.abs(gt_disp))
    d1 = _masked_mean(bad.astype(jnp.float32), valid)
    return {"epe": epe, "d1_all": d1}
