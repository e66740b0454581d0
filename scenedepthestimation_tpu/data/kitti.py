"""KITTI raw (Eigen split) dataset (SURVEY C3).

Split-file-compatible with the reference family: each line is
``<drive_folder> <frame_index> <side>`` (monodepth2/Eigen convention),
e.g. ``2011_09_26/2011_09_26_drive_0002_sync 69 l``. Images live at
``{root}/{folder}/image_0{2|3}/data/{frame:010d}.png``; GT depth comes
either from velodyne projection (``velodyne_points/data/{frame}.bin`` +
per-date calib) or from the improved annotated-depth PNGs
(``{gt_root}/{drive}/proj_depth/groundtruth/image_0N/{frame}.png``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np

from scenedepthestimation_tpu.data import io

_SIDE_DIR = {"l": "image_02", "r": "image_03"}
_SIDE_CAM = {"l": 2, "r": 3}


def read_split_file(path: str) -> List[Tuple[str, int, str]]:
    items = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            folder = parts[0]
            frame = int(parts[1]) if len(parts) > 1 else 0
            side = parts[2] if len(parts) > 2 else "l"
            items.append((folder, frame, side))
    return items


@dataclass
class KittiRawDataset:
    """Eigen-split KITTI raw frames with optional GT depth.

    ``load_pair=True`` additionally loads the opposite camera of the
    rectified rig as ``pair_image`` (self-supervised 'stereo mode'
    training, SURVEY C14) along with the rig intrinsics.
    """

    root: str
    split_file: str
    gt: str = "velodyne"  # "velodyne" | "improved" | "npz" | "none"
    gt_root: Optional[str] = None  # improved: GT tree root; npz: .npz path
    load_pair: bool = False
    load_intrinsics: bool = False  # rig calib without the pair image

    def __post_init__(self):
        self.items = read_split_file(self.split_file)
        if self.gt == "npz":
            # Precomputed GT (scenedepth export-gt / the family's
            # export_gt_depths_kitti.py): object array of per-frame
            # float32 depth maps in split-file order.
            if not self.gt_root:
                raise ValueError("gt='npz' needs gt_root=<gt_depths.npz>")
            self._npz_gt = np.load(self.gt_root, allow_pickle=True)["data"]
            if len(self._npz_gt) != len(self.items):
                raise ValueError(
                    f"{self.gt_root}: {len(self._npz_gt)} GT maps for "
                    f"{len(self.items)} split entries — wrong split?"
                )

    def __len__(self) -> int:
        return len(self.items)

    def image_path(self, idx: int) -> str:
        folder, frame, side = self.items[idx]
        return os.path.join(
            self.root, folder, _SIDE_DIR[side], "data", f"{frame:010d}.png"
        )

    def __getitem__(self, idx: int) -> dict:
        folder, frame, side = self.items[idx]
        image = io.load_image(self.image_path(idx))
        sample = {
            "image": image,
            "folder": folder,
            "frame": frame,
            "side": side,
            "index": idx,
        }
        if self.load_pair:
            other = "r" if side == "l" else "l"
            pair_path = os.path.join(
                self.root, folder, _SIDE_DIR[other], "data", f"{frame:010d}.png"
            )
            sample["pair_image"] = io.load_image(pair_path)
        if self.load_pair or self.load_intrinsics:
            date = folder.split("/")[0]
            try:
                sample["intrinsics"] = io.kitti_intrinsics(
                    os.path.join(self.root, date), cam=_SIDE_CAM[side]
                )
            except (OSError, KeyError):
                sample["intrinsics"] = None
        if self.gt == "velodyne":
            date = folder.split("/")[0]
            calib_dir = os.path.join(self.root, date)
            velo = os.path.join(
                self.root, folder, "velodyne_points", "data", f"{frame:010d}.bin"
            )
            sample["gt_depth"] = io.velodyne_to_depth(
                velo, calib_dir, cam=_SIDE_CAM[side], image_hw=image.shape[:2]
            )
        elif self.gt == "improved":
            gt_root = self.gt_root or self.root
            drive = folder.split("/")[-1]
            path = os.path.join(
                gt_root,
                drive,
                "proj_depth",
                "groundtruth",
                _SIDE_DIR[side],
                f"{frame:010d}.png",
            )
            sample["gt_depth"] = io.load_depth_png16(path)
        elif self.gt == "npz":
            sample["gt_depth"] = np.asarray(self._npz_gt[idx], np.float32)
        return sample

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]


def export_gt_depths(
    root: str,
    split_file: str,
    out_path: str,
    gt: str = "velodyne",
    gt_root: Optional[str] = None,
) -> int:
    """Precompute per-frame GT depth maps for a split → ``out_path``
    (.npz, key ``data`` = object array in split-file order).

    The reference family's ``export_gt_depths_kitti.py`` convention:
    eval then loads the precomputed maps (``gt='npz'``) instead of
    re-projecting velodyne scans every run — the projection is ~all of
    the eval's host time once predictions are device-resident. Returns
    the number of frames exported.
    """
    ds = KittiRawDataset(
        root=root, split_file=split_file, gt=gt, gt_root=gt_root
    )
    maps = []
    for i in range(len(ds)):
        # GT only — skip the image decode (export touches no pixels).
        folder, frame, side = ds.items[i]
        if gt == "velodyne":
            date = folder.split("/")[0]
            velo = os.path.join(
                root, folder, "velodyne_points", "data", f"{frame:010d}.bin"
            )
            from PIL import Image

            with Image.open(ds.image_path(i)) as im:
                hw = (im.height, im.width)  # header read, no decode
            maps.append(
                io.velodyne_to_depth(
                    velo, os.path.join(root, date), cam=_SIDE_CAM[side],
                    image_hw=hw,
                )
            )
        else:
            maps.append(ds[i]["gt_depth"])
    arr = np.empty(len(maps), dtype=object)
    arr[:] = maps
    np.savez_compressed(out_path, data=arr)
    return len(maps)


def batched(dataset, batch_size: int, pad_last: bool = True):
    """Group samples into batches of stacked images + lists of GT.

    GT maps keep per-image resolution (KITTI frames vary by drive), so
    they stay a list; images within a KITTI drive share a shape — when
    shapes differ across a batch the batch is split at the boundary.
    """
    buf: List[dict] = []
    for sample in dataset:
        if buf and sample["image"].shape != buf[0]["image"].shape:
            yield _stack(buf, batch_size if pad_last else None)
            buf = []
        buf.append(sample)
        if len(buf) == batch_size:
            yield _stack(buf, None)
            buf = []
    if buf:
        yield _stack(buf, batch_size if pad_last else None)


def _stack(buf: List[dict], pad_to: Optional[int]) -> dict:
    images = np.stack([s["image"] for s in buf])
    n_real = len(buf)
    if pad_to is not None and n_real < pad_to:
        # Repeat the last frame so the jitted program sees a full batch
        # (static shapes); the pad rows are dropped via n_real.
        pad = np.repeat(images[-1:], pad_to - n_real, axis=0)
        images = np.concatenate([images, pad], axis=0)
    out = {"images": images, "n_real": n_real}
    if "gt_depth" in buf[0]:
        out["gt_depths"] = [s["gt_depth"] for s in buf]
    out["meta"] = [
        {k: s[k] for k in ("folder", "frame", "side", "index") if k in s}
        for s in buf
    ]
    return out
