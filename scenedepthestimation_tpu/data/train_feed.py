"""Training batchers (SURVEY C18 data path): fixed-size batches at
network resolution, host-side only for decode/indexing/crop —
augmentation itself runs on device (ops/augment inside the train step).

Pipelining (VERDICT r4 weak-#1 — the training feed was the one
production path with no feed-rate story): every batcher takes
``workers`` — N>0 decodes samples on a thread pool (the native PNG
decoder releases the GIL, data/io.py, so decode threads genuinely
overlap the consumer's JAX dispatch), with a bounded in-flight window
so memory stays O(workers), not O(epoch). Batch content is
bit-identical for every ``workers`` value: the per-epoch random state
(shuffle order + crop fractions) is drawn UP FRONT from the seeded
generator, then samples are mapped in order — parallelism changes
only the schedule, never the stream. Device transfer/overlap is the
consumer's job (parallel/feed.PipelinedFeed in cli.cmd_train).
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


import contextlib


@contextlib.contextmanager
def _maybe_executor(workers: int):
    """One thread pool for a batcher generator's WHOLE lifetime (all
    epochs) — a per-epoch pool would rebuild threads and join the
    in-flight tail at every epoch boundary. None when ``workers<=0``."""
    if workers <= 0:
        yield None
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=workers) as ex:
        yield ex


def _prefetch_map(fn, items, workers: int, ex=None):
    """Yield ``fn(item)`` in input order; with an executor, up to
    ``workers`` calls run concurrently inside a bounded (2x) in-flight
    window. ``ex=None`` + ``workers>0`` builds a pool just for this
    call (tests / one-shot use)."""
    if workers <= 0:
        for it in items:
            yield fn(it)
        return
    if ex is None:
        with _maybe_executor(workers) as ex2:
            yield from _prefetch_map(fn, items, workers, ex2)
        return
    from collections import deque

    ahead = 2 * workers
    pending: deque = deque()
    for it in items:
        pending.append(ex.submit(fn, it))
        if len(pending) > ahead:
            yield pending.popleft().result()
    while pending:
        yield pending.popleft().result()


def _crop_at(u, arrays, out_hw):
    """Crop a consistent window from (H, W, ...) arrays at fractional
    offset ``u = (uy, ux) ∈ [0,1)²`` — offsets are pre-drawn per epoch
    so decode workers cannot perturb the random stream."""
    h, w = arrays[0].shape[:2]
    th, tw = out_hw
    if h < th or w < tw:
        raise ValueError(f"frame {h}x{w} smaller than crop {th}x{tw}")
    y = int(u[0] * (h - th + 1))
    x = int(u[1] * (w - tw + 1))
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


def _epoch_plan(rng, n: int):
    """One epoch's random state, drawn up front: (shuffle order, per-
    sample crop fractions)."""
    return rng.permutation(n), rng.random((n, 2))


def stereo_train_batches(
    dataset,
    net_hw,
    batch_size: int,
    seed: int = 0,
    epochs: Optional[int] = None,
    workers: int = 0,
) -> Iterator[dict]:
    """KITTI-2015-style samples → {'left','right','gt_disp','valid'}
    batches, random-cropped to ``net_hw``, shuffled per epoch."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    with _maybe_executor(workers) as _ex:
      while epochs is None or epoch < epochs:
        order, us = _epoch_plan(rng, n)

        def load(i_idx):
            i, idx = i_idx
            s = dataset[int(idx)]
            left, right, gt = _crop_at(
                us[i], [s["left"], s["right"], s["gt_disp"]], net_hw
            )
            return left, right, gt

        buf = {"left": [], "right": [], "gt_disp": [], "valid": []}
        for left, right, gt in _prefetch_map(load, enumerate(order), workers, ex=_ex):
            buf["left"].append(left)
            buf["right"].append(right)
            buf["gt_disp"].append(gt)
            buf["valid"].append(gt > 0)
            if len(buf["left"]) == batch_size:
                yield {k: np.stack(v) for k, v in buf.items()}
                buf = {k: [] for k in buf}
        epoch += 1


def stereo_selfsup_batches(
    dataset,
    net_hw,
    batch_size: int,
    seed: int = 0,
    epochs: Optional[int] = None,
    workers: int = 0,
) -> Iterator[dict]:
    """Pairs only, truly no GT required: {'left','right'} batches —
    works on unlabeled rectified pairs (e.g. KITTI-2015 split='testing')."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    with _maybe_executor(workers) as _ex:
      while epochs is None or epoch < epochs:
        order, us = _epoch_plan(rng, n)

        def load(i_idx):
            i, idx = i_idx
            s = dataset[int(idx)]
            return _crop_at(us[i], [s["left"], s["right"]], net_hw)

        left_buf, right_buf = [], []
        for left, right in _prefetch_map(load, enumerate(order), workers, ex=_ex):
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
    workers: int = 0,
    sample: str = "crop",
) -> Iterator[dict]:
    """Supervised mono batches (SURVEY C14/C18 Eigen-split supervised
    training; VERDICT r3 missing-#2): KITTI raw samples with GT depth
    (``KittiRawDataset`` gt='velodyne'|'improved'|'npz') →
    {'image' uint8 BHW3, 'gt_disp' float32 BHW1} batches for
    train.make_mono_train_step.

    GT metric depth is encoded into the network's [0, 1]
    sigmoid-disparity units (ops.disp_to_depth.sigmoid_disp_from_depth;
    0 = invalid/no-return, the loss-mask convention). Sigmoid units are
    depth-based — resolution-free — so both spatial samplings below are
    geometrically exact (unlike pixel disparity).

    ``sample``: 'crop' (default) random-crops raw frames to ``net_hw``
    — full-resolution detail, but a train/eval field-of-view mismatch
    vs the Eigen eval path's full-frame resize (ADVICE r4). 'resize'
    matches the eval path: full frame bilinear-resized to ``net_hw``,
    sparse GT resampled by NEAREST (bilinear would blend valid depths
    with 0-invalid holes; nearest keeps the sparse validity semantics
    and ~(sy·sx) of the points, uniformly)."""
    from scenedepthestimation_tpu.ops.disp_to_depth import (
        sigmoid_disp_from_depth,
    )

    if sample not in ("crop", "resize"):
        raise ValueError(f"sample must be 'crop' or 'resize', got {sample!r}")
    rng = np.random.default_rng(seed)
    th, tw = net_hw
    n = len(dataset)
    _check_enough(n, batch_size)
    epoch = 0
    with _maybe_executor(workers) as _ex:
      while epochs is None or epoch < epochs:
        order, us = _epoch_plan(rng, n)

        def load(i_idx):
            from PIL import Image

            i, idx = i_idx
            s = dataset[int(idx)]
            if "gt_depth" not in s:
                raise ValueError(
                    "mono supervised training needs GT depth — build the "
                    "dataset with gt='velodyne', 'improved' or 'npz'"
                )
            gt = sigmoid_disp_from_depth(
                np.asarray(s["gt_depth"], np.float32), min_depth, max_depth
            )[..., None]
            if sample == "crop":
                return _crop_at(us[i], [s["image"], gt], net_hw)
            img = np.asarray(
                Image.fromarray(s["image"]).resize((tw, th), Image.BILINEAR)
            )
            h, w = gt.shape[:2]
            ys = (np.arange(th) * (h / th)).astype(np.int64)
            xs = (np.arange(tw) * (w / tw)).astype(np.int64)
            return img, gt[ys][:, xs]

        img_buf, gt_buf = [], []
        for img, gt in _prefetch_map(load, enumerate(order), workers, ex=_ex):
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
    workers: int = 0,
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
    with _maybe_executor(workers) as _ex:
      while epochs is None or epoch < epochs:
        order, us = _epoch_plan(rng, n)

        def load(i_idx):
            i, idx = i_idx
            s = dataset[int(idx)]
            if "pair_image" not in s:
                raise ValueError("dataset must be built with load_pair=True")
            lf, rt = (s["image"], s["pair_image"])
            if s.get("side", "l") == "r":  # keep left camera on the left
                lf, rt = rt, lf
            return _crop_at(us[i], [lf, rt], net_hw)

        left_buf, right_buf = [], []
        for lf, rt in _prefetch_map(load, enumerate(order), workers, ex=_ex):
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
    workers: int = 0,
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
    with _maybe_executor(workers) as _ex:
      while epochs is None or epoch < epochs:
        order = rng.permutation(n)

        def load(idx):
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
            return resized, k

        frames_buf, k_buf = [], []
        for resized, k in _prefetch_map(load, order, workers, ex=_ex):
            frames_buf.append(resized)
            k_buf.append(k)
            if len(frames_buf) == batch_size:
                yield {"frames": np.stack(frames_buf), "K": np.stack(k_buf)}
                frames_buf, k_buf = [], []
        epoch += 1
