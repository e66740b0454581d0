"""Training batchers (SURVEY C18 data path): fixed-size batches at
network resolution via random crop (the family's training convention),
host-side only for indexing/crop — augmentation itself runs on device
(ops/augment inside the train step).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def _random_crop(rng, arrays, out_hw):
    """Crop a consistent window from (H, W, ...) arrays."""
    h, w = arrays[0].shape[:2]
    th, tw = out_hw
    if h < th or w < tw:
        raise ValueError(f"frame {h}x{w} smaller than crop {th}x{tw}")
    y = int(rng.integers(0, h - th + 1))
    x = int(rng.integers(0, w - tw + 1))
    return [a[y : y + th, x : x + tw] for a in arrays]


def _check_enough(n: int, batch_size: int) -> None:
    """Every batcher drops partial batches, so a dataset smaller than one
    batch would make the epochs=None loop spin forever yielding nothing
    (an empty split file / wrong --data-root must fail loudly)."""
    if n < batch_size:
        raise ValueError(
            f"dataset has {n} usable sample(s) but batch_size={batch_size}; "
            f"nothing would ever be yielded"
        )


def stereo_train_batches(
    dataset,
    net_hw,
    batch_size: int,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """KITTI-2015-style samples → {'left','right','gt_disp','valid'}
    batches, random-cropped to ``net_hw``, shuffled per epoch."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        buf = {"left": [], "right": [], "gt_disp": [], "valid": []}
        for idx in order:
            s = dataset[int(idx)]
            left, right, gt = _random_crop(
                rng, [s["left"], s["right"], s["gt_disp"]], net_hw
            )
            buf["left"].append(left)
            buf["right"].append(right)
            buf["gt_disp"].append(gt)
            buf["valid"].append(gt > 0)
            if len(buf["left"]) == batch_size:
                yield {k: np.stack(v) for k, v in buf.items()}
                buf = {k: [] for k in buf}
        epoch += 1


def stereo_selfsup_batches(
    dataset, net_hw, batch_size: int, seed: int = 0, epochs: Optional[int] = None
) -> Iterator[dict]:
    """Pairs only, truly no GT required: {'left','right'} batches —
    works on unlabeled rectified pairs (e.g. KITTI-2015 split='testing')."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        left_buf, right_buf = [], []
        for idx in order:
            s = dataset[int(idx)]
            left, right = _random_crop(rng, [s["left"], s["right"]], net_hw)
            left_buf.append(left)
            right_buf.append(right)
            if len(left_buf) == batch_size:
                yield {"left": np.stack(left_buf), "right": np.stack(right_buf)}
                left_buf, right_buf = [], []
        epoch += 1


def mono_train_batches(
    dataset,
    net_hw,
    batch_size: int,
    min_depth: float = 0.1,
    max_depth: float = 100.0,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """Supervised mono batches (SURVEY C14/C18 Eigen-split supervised
    training; VERDICT r3 missing-#2): KITTI raw samples with GT depth
    (``KittiRawDataset`` gt='velodyne'|'improved'|'npz') →
    {'image' uint8 BHW3, 'gt_disp' float32 BHW1} batches for
    train.make_mono_train_step.

    GT metric depth is encoded into the network's [0, 1]
    sigmoid-disparity units (ops.disp_to_depth.sigmoid_disp_from_depth;
    0 = invalid/no-return, the loss-mask convention). Sigmoid units are
    depth-based — resolution-free — so the shared random crop to
    ``net_hw`` is geometrically exact (unlike pixel disparity)."""
    from scenedepthestimation_tpu.ops.disp_to_depth import (
        sigmoid_disp_from_depth,
    )

    rng = np.random.default_rng(seed)
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        img_buf, gt_buf = [], []
        for idx in order:
            s = dataset[int(idx)]
            if "gt_depth" not in s:
                raise ValueError(
                    "mono supervised training needs GT depth — build the "
                    "dataset with gt='velodyne', 'improved' or 'npz'"
                )
            gt = sigmoid_disp_from_depth(
                np.asarray(s["gt_depth"], np.float32), min_depth, max_depth
            )[..., None]
            img, gt = _random_crop(rng, [s["image"], gt], net_hw)
            img_buf.append(img)
            gt_buf.append(gt)
            if len(img_buf) == batch_size:
                yield {
                    "image": np.stack(img_buf),
                    "gt_disp": np.stack(gt_buf).astype(np.float32),
                }
                img_buf, gt_buf = [], []
        epoch += 1


def mono_pair_batches(
    dataset,
    net_hw,
    batch_size: int,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """KITTI raw pairs (``KittiRawDataset(load_pair=True)``) →
    {'left','right'} batches for mono 'stereo mode' self-supervision.
    Left = the split-file camera, right = the opposite rig camera;
    random-cropped consistently (the rig baseline is unaffected by
    translation-only crops)."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        left_buf, right_buf = [], []
        for idx in order:
            s = dataset[int(idx)]
            if "pair_image" not in s:
                raise ValueError("dataset must be built with load_pair=True")
            lf, rt = (s["image"], s["pair_image"])
            if s.get("side", "l") == "r":  # keep left camera on the left
                lf, rt = rt, lf
            lf, rt = _random_crop(rng, [lf, rt], net_hw)
            left_buf.append(lf)
            right_buf.append(rt)
            if len(left_buf) == batch_size:
                yield {"left": np.stack(left_buf), "right": np.stack(right_buf)}
                left_buf, right_buf = [], []
        epoch += 1


class TripletDataset:
    """Temporal triplets [prev, target, next] over a KittiRawDataset
    (SURVEY C14 temporal self-supervision). Items whose neighbours fall
    outside the drive are dropped."""

    def __init__(self, base):
        self.base = base
        by_drive = {}
        for i, (folder, frame, side) in enumerate(base.items):
            by_drive.setdefault((folder, side), {})[frame] = i
        self.triplets = []
        for (folder, side), frames in by_drive.items():
            for frame, idx in frames.items():
                if frame - 1 in frames and frame + 1 in frames:
                    self.triplets.append(
                        (frames[frame - 1], idx, frames[frame + 1])
                    )

    def __len__(self):
        return len(self.triplets)

    def __getitem__(self, i):
        ip, it, inx = self.triplets[i]
        prev = self.base[ip]
        tgt = self.base[it]
        nxt = self.base[inx]
        out = {
            "frames": np.stack([prev["image"], tgt["image"], nxt["image"]]),
            "index": it,
        }
        if "intrinsics" in tgt and tgt["intrinsics"]:
            out["intrinsics"] = tgt["intrinsics"]
        return out


def temporal_train_batches(
    dataset: TripletDataset,
    net_hw,
    batch_size: int,
    focal_px: float,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[dict]:
    """Triplets → {'frames' (B,3,h,w,3), 'K' (B,3,3)} batches.

    Frames are full-frame resized to the network resolution and the
    pinhole intrinsics rescaled PER AXIS (fx,cx by sx; fy,cy by sy) —
    geometrically exact for a resize, no crop involved. When a sample
    carries no calibration, KITTI-typical defaults are used
    (fy=fx=``focal_px``, principal point at the image center).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    th, tw = net_hw
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n)
        frames_buf, k_buf = [], []
        for idx in order:
            s = dataset[int(idx)]
            f = s["frames"]  # (3, H, W, 3)
            h, w = f.shape[1:3]
            resized = np.stack(
                [
                    np.asarray(
                        Image.fromarray(fr).resize((tw, th), Image.BILINEAR)
                    )
                    for fr in f
                ]
            )
            intr = s.get("intrinsics") if isinstance(s.get("intrinsics"), dict) else {}
            fx = intr.get("focal_px", focal_px)
            fy = intr.get("fy_px", fx)
            cx = intr.get("cx_px", w / 2.0)
            cy = intr.get("cy_px", h / 2.0)
            sx, sy = tw / w, th / h
            k = np.array(
                [[fx * sx, 0, cx * sx], [0, fy * sy, cy * sy], [0, 0, 1]],
                np.float32,
            )
            frames_buf.append(resized)
            k_buf.append(k)
            if len(frames_buf) == batch_size:
                yield {"frames": np.stack(frames_buf), "K": np.stack(k_buf)}
                frames_buf, k_buf = [], []
        epoch += 1
