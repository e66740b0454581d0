"""Dataset evaluation harness (SURVEY C20, call stack §3.3).

Protocols:

* ``eigen``     — KITTI raw Eigen split, monocular: forward at network
  res, API resizes disparity to source res, depth = 1/scaled_disp; then
  per-image Garg/Eigen crop, depth cap [1e-3, 80] m, median scaling, and
  the 7 standard metrics. abs_rel is the judged parity metric.
* ``nyu``       — NYUv2: center crop (45..471, 41..601), 10 m cap,
  median scaling.
* ``kitti2015`` — stereo: EPE + D1-all over valid GT pixels.
* ``odom``      — KITTI odometry pose ATE (monodepth2-lineage 5-frame
  snippet protocol) on a sequence with GT poses (conventionally 09/10).

Per-image metric kernels are jit-cached per GT resolution (KITTI frames
come in a handful of sizes). Results stream as one JSON line per batch
on stderr-style stdout (SURVEY §5.5) and aggregate to means.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.api import Predictor, load_weights
from scenedepthestimation_tpu.configs import EvalConfig, RunConfig
from scenedepthestimation_tpu.utils import metrics as M

_MONO_METRICS = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


@functools.lru_cache(maxsize=32)
def _eigen_metric_fn(hw, cfg: EvalConfig, apply_crop: bool):
    @jax.jit
    def fn(pred_depth, gt_depth):
        return M.evaluate_depth_image(
            pred_depth, gt_depth, cfg, apply_eigen_crop=apply_crop
        )

    return fn


@functools.lru_cache(maxsize=32)
def _nyu_metric_fn(hw, cfg: EvalConfig):
    r0, r1, c0, c1 = 45, 471, 41, 601

    @jax.jit
    def fn(pred_depth, gt_depth):
        mask = (gt_depth > cfg.min_depth) & (gt_depth < cfg.max_depth)
        crop = jnp.zeros(gt_depth.shape, bool).at[r0:r1, c0:c1].set(True)
        mask = mask & crop
        pred = pred_depth
        if cfg.median_scaling:
            ratio = M._masked_median(gt_depth, mask) / jnp.maximum(
                M._masked_median(pred, mask), 1e-12
            )
            pred = pred * ratio
        pred = jnp.clip(pred, cfg.min_depth, cfg.max_depth)
        out = M.depth_errors(gt_depth, pred, mask)
        out["n_valid"] = jnp.sum(mask).astype(jnp.int32)
        return out

    return fn


def _resize_pred_to_gt(pred_depth: np.ndarray, gt_hw) -> jnp.ndarray:
    """Bilinear-resize a predicted depth map to the GT resolution."""
    if pred_depth.shape == tuple(gt_hw):
        return jnp.asarray(pred_depth)
    from scenedepthestimation_tpu.ops.preprocess import resize_bilinear

    out = resize_bilinear(
        jnp.asarray(pred_depth)[None, ..., None], tuple(gt_hw), antialias=False
    )
    return out[0, ..., 0]


def eval_mono_dataset(
    predictor: Predictor,
    dataset,
    eval_cfg: EvalConfig,
    protocol: str = "eigen",
    batch_size: int = 8,
    max_items: Optional[int] = None,
    log_every: int = 0,
) -> Dict[str, float]:
    from scenedepthestimation_tpu.data.kitti import batched

    sums = {k: 0.0 for k in _MONO_METRICS}
    count = 0
    skipped = 0
    for batch in batched(dataset, batch_size):
        out = predictor.mono_forward(jnp.asarray(batch["images"]))
        depths = np.asarray(out["depth"])  # (B, H, W) at source res
        for i in range(batch["n_real"]):
            if max_items is not None and count >= max_items:
                break
            gt = batch["gt_depths"][i]
            pred = _resize_pred_to_gt(depths[i], gt.shape)
            if protocol == "eigen":
                fn = _eigen_metric_fn(gt.shape, eval_cfg, True)
            elif protocol == "nyu":
                fn = _nyu_metric_fn(gt.shape, eval_cfg)
            else:
                raise ValueError(f"unknown protocol {protocol!r}")
            m = fn(pred, jnp.asarray(gt))
            if int(m["n_valid"]) == 0:
                # No valid GT inside the crop: the metric values are
                # degenerate zeros — skip rather than dilute the mean.
                skipped += 1
                continue
            for k in _MONO_METRICS:
                sums[k] += float(m[k])
            count += 1
        if log_every and count % log_every == 0:
            print(json.dumps({"evaluated": count}))
        if max_items is not None and count >= max_items:
            break
    if count == 0:
        raise ValueError("no evaluable items (missing GT?)")
    result = {k: v / count for k, v in sums.items()}
    result["count"] = count
    if skipped:
        result["skipped_no_valid_gt"] = skipped
    return result


def eval_stereo_dataset(
    predictor: Predictor,
    dataset,
    eval_cfg: EvalConfig,
    batch_size: int = 4,
    max_items: Optional[int] = None,
) -> Dict[str, float]:
    from scenedepthestimation_tpu.data.kitti2015 import batched

    @functools.lru_cache(maxsize=8)
    def metric_fn(hw):
        @jax.jit
        def fn(pred, gt, valid):
            return M.disparity_errors(pred, gt, valid, eval_cfg)

        return fn

    sums = {"epe": 0.0, "d1_all": 0.0}
    count = 0
    for batch in batched(dataset, batch_size):
        out = predictor.stereo_forward(
            jnp.asarray(batch["left"]), jnp.asarray(batch["right"])
        )
        disp = np.asarray(out["disp"])
        for i in range(batch["n_real"]):
            if max_items is not None and count >= max_items:
                break
            if not np.any(batch["valid"][i]):
                # No valid GT pixels: disparity_errors returns degenerate
                # zeros — skip rather than dilute the mean (same rule as
                # eval_mono_dataset's n_valid skip; r2 review finding).
                continue
            m = metric_fn(batch["gt_disp"][i].shape)(
                jnp.asarray(disp[i]),
                jnp.asarray(batch["gt_disp"][i]),
                jnp.asarray(batch["valid"][i]),
            )
            sums["epe"] += float(m["epe"])
            sums["d1_all"] += float(m["d1_all"])
            count += 1
        if max_items is not None and count >= max_items:
            break
    if count == 0:
        raise ValueError("no evaluable items")
    result = {k: v / count for k, v in sums.items()}
    result["count"] = count
    return result


def _load_pose_net(weights: Optional[str], cfg: RunConfig, seed: int):
    """PoseNet + variables from any accepted checkpoint layout.

    Accepts the Trainer's ``*_pose`` Orbax artifact (pose tree at the
    root), a reference-family torch dir (``pose_encoder.pth`` +
    ``pose.pth`` nesting under ``params['pose']``), or None (random init,
    smoke only)."""
    from scenedepthestimation_tpu.models.posenet import PoseNet
    from scenedepthestimation_tpu.utils import checkpoint

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    model = PoseNet(dtype=dtype)
    h, w = cfg.mono.height, cfg.mono.width
    init = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, h, w, 6), dtype)
    )
    if weights is None:
        return model, init
    loaded = checkpoint.load_variables(weights, pipeline="mono")
    params = loaded.get("params", {})
    stats = loaded.get("batch_stats", {})
    if "pose" in params:
        params = params["pose"]
        stats = stats.get("pose", {}) if isinstance(stats, dict) else {}
    if "squeeze" not in params.get("decoder", {}):
        raise ValueError(
            f"{weights!r} holds no pose network (expected a 'pose' subtree "
            "or a PoseNet-rooted checkpoint such as the Trainer's *_pose "
            "artifact)"
        )
    variables = {"params": params, "batch_stats": stats or init["batch_stats"]}
    return model, variables


def eval_pose_dataset(
    weights: Optional[str],
    dataset,
    cfg: RunConfig,
    batch_size: int = 8,
    max_items: Optional[int] = None,
    track_length: int = 5,
    seed: int = 0,
) -> Dict[str, float]:
    """KITTI odometry pose evaluation (monodepth2-lineage protocol,
    grade E2): PoseNet on every consecutive frame pair, ATE mean/std
    over all overlapping ``track_length``-frame snippets against the
    sequence's GT trajectory. The network forward is ONE jitted batched
    program (uint8 pairs in, fp32 4x4 transforms out); the 4x4 chaining
    is host-side numpy (SURVEY §5.5-style one-JSON-line streaming)."""
    from scenedepthestimation_tpu.data.odometry import pair_batches
    from scenedepthestimation_tpu.ops.preprocess import preprocess
    from scenedepthestimation_tpu.ops.project import pose_vec_to_mat

    gt = dataset.gt_poses()
    if gt is None:
        raise ValueError(
            f"sequence {dataset.sequence!r} has no GT poses file"
        )
    if max_items is not None:
        dataset = dataclasses.replace(
            dataset, frame_ids=dataset.frame_ids[:max_items]
        )
        gt = gt[:max_items]

    model, variables = _load_pose_net(weights, cfg, seed)
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    net_hw = (cfg.mono.height, cfg.mono.width)

    @jax.jit
    def run(pairs):  # (b, 2, H, W, 3) uint8 → (b, 4, 4) fp32
        b = pairs.shape[0]
        flat = pairs.reshape((2 * b,) + pairs.shape[2:])
        x = preprocess(flat, net_hw, cfg.pre, compute_dtype=dtype)
        pair = jnp.concatenate([x[0::2], x[1::2]], axis=-1)
        aa, tt = model.apply(variables, pair, train=False)
        return pose_vec_to_mat(
            aa.astype(jnp.float32), tt.astype(jnp.float32), invert=False
        )

    preds = []
    for batch in pair_batches(dataset, batch_size):
        mats = np.asarray(run(jnp.asarray(batch["pairs"])))
        preds.append(mats[: batch["n_real"]])
    pred_local = np.concatenate(preds, axis=0)

    ates = M.snippet_ates(gt, pred_local, track_length=track_length)
    out = {
        "ate_mean": float(ates.mean()),
        "ate_std": float(ates.std()),
        "n_snippets": int(ates.shape[0]),
        "n_frames": int(len(dataset)),
    }
    print(json.dumps({"protocol": "odom", "sequence": dataset.sequence, **out}))
    return out


def run_eval(
    config: str | RunConfig = "mono_eigen_eval",
    weights: Optional[str] = None,
    data_root: str = "",
    split: str = "eigen",
    split_file: Optional[str] = None,
    max_items: Optional[int] = None,
    batch_size: Optional[int] = None,
    seed: int = 0,
    sequence: str = "09",
    gt: str = "velodyne",
    gt_root: Optional[str] = None,
) -> Dict[str, float]:
    """CLI entry (SURVEY §3.3): build dataset + predictor, evaluate.

    ``gt``/``gt_root`` select the Eigen-split GT source: on-the-fly
    velodyne projection (default), the improved annotated-depth PNG
    tree, or a precomputed ``gt_depths.npz`` from
    ``scenedepth export-gt`` (family ``export_gt_depths_kitti``
    convention)."""
    cfg = configs.get(config) if isinstance(config, str) else config
    if batch_size is not None:
        cfg = dataclasses.replace(cfg, batch_size=batch_size)
    if split == "odom":
        from scenedepthestimation_tpu.data.odometry import KittiOdometryDataset

        ds = KittiOdometryDataset(root=data_root, sequence=sequence)
        return eval_pose_dataset(
            weights, ds, cfg, cfg.batch_size, max_items, seed=seed
        )
    predictor = load_weights(weights, cfg, seed=seed)

    if split == "eigen":
        from scenedepthestimation_tpu.data.kitti import KittiRawDataset

        sf = split_file or os.path.join(data_root, "splits", "eigen", "test_files.txt")
        ds = KittiRawDataset(root=data_root, split_file=sf, gt=gt, gt_root=gt_root)
        return eval_mono_dataset(
            predictor, ds, cfg.eval, "eigen", cfg.batch_size, max_items
        )
    if split == "nyu":
        from scenedepthestimation_tpu.data.nyu import NyuDataset

        ds = NyuDataset(root=data_root)
        nyu_eval = dataclasses.replace(cfg.eval, max_depth=10.0)
        return eval_mono_dataset(
            predictor, ds, nyu_eval, "nyu", cfg.batch_size, max_items
        )
    if split == "kitti2015":
        from scenedepthestimation_tpu.data.kitti2015 import Kitti2015Dataset

        ds = Kitti2015Dataset(root=data_root)
        return eval_stereo_dataset(
            predictor, ds, cfg.eval, cfg.batch_size, max_items
        )
    raise ValueError(f"unknown split {split!r}")
