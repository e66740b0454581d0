"""Dataset evaluation harness (SURVEY C20, call stack §3.3).

Protocols:

* ``eigen``     — KITTI raw Eigen split, monocular: forward at network
  res, API resizes disparity to source res, depth = 1/scaled_disp; then
  per-image Garg/Eigen crop, depth cap [1e-3, 80] m, median scaling, and
  the 7 standard metrics. abs_rel is the judged parity metric.
* ``nyu``       — NYUv2: center crop (45..471, 41..601), 10 m cap,
  median scaling.
* ``kitti2015`` — stereo: EPE + D1-all over valid GT pixels.

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


def run_eval(
    config: str | RunConfig = "mono_eigen_eval",
    weights: Optional[str] = None,
    data_root: str = "",
    split: str = "eigen",
    split_file: Optional[str] = None,
    max_items: Optional[int] = None,
    batch_size: Optional[int] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """CLI entry (SURVEY §3.3): build dataset + predictor, evaluate."""
    cfg = configs.get(config) if isinstance(config, str) else config
    if batch_size is not None:
        cfg = dataclasses.replace(cfg, batch_size=batch_size)
    predictor = load_weights(weights, cfg, seed=seed)

    if split == "eigen":
        from scenedepthestimation_tpu.data.kitti import KittiRawDataset

        sf = split_file or os.path.join(data_root, "splits", "eigen", "test_files.txt")
        ds = KittiRawDataset(root=data_root, split_file=sf, gt="velodyne")
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
