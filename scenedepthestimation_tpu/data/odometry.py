"""KITTI odometry dataset (SURVEY §2 C3-family; monodepth2-lineage pose
evaluation protocol, grade E2 — the reference mount was empty, so the
layout below is the public KITTI odometry benchmark layout the family
evaluates on, seqs 09/10 conventionally):

``{root}/sequences/{seq}/image_2/{i:06d}.png`` — left color frames
``{root}/sequences/{seq}/calib.txt``           — P0..P3 projection rows
``{root}/poses/{seq}.txt``                     — GT cam-to-world poses,
one row per frame, 12 floats = row-major 3x4 [R|t] (seqs 00-10 only).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

from scenedepthestimation_tpu.data import io


def read_poses_file(path: str) -> np.ndarray:
    """KITTI odometry poses txt → (N, 4, 4) float64 cam-to-world."""
    rows = np.loadtxt(path, dtype=np.float64)
    if rows.ndim == 1:
        rows = rows[None]
    if rows.shape[1] != 12:
        raise ValueError(f"expected 12 values per pose row, got {rows.shape[1]}")
    n = rows.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, :] = rows.reshape(n, 3, 4)
    return poses


def read_odometry_calib(path: str) -> dict:
    """``calib.txt`` → {'P2': (3, 4), ...} projection matrices."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, vals = line.split(":", 1)
            arr = np.fromstring(vals, sep=" ", dtype=np.float64)
            if arr.size == 12:
                out[key.strip()] = arr.reshape(3, 4)
    return out


@dataclass
class KittiOdometryDataset:
    """Consecutive left-color frames of one odometry sequence.

    ``__getitem__(i)`` yields frame ``i``; :meth:`pairs` batches the
    (i, i+1) pairs the pose network consumes.
    """

    root: str
    sequence: str = "09"
    frame_ids: List[int] = field(default_factory=list)

    def __post_init__(self):
        self.seq_dir = os.path.join(self.root, "sequences", self.sequence)
        img_dir = os.path.join(self.seq_dir, "image_2")
        if not self.frame_ids:
            names = sorted(f for f in os.listdir(img_dir) if f.endswith(".png"))
            self.frame_ids = [int(os.path.splitext(f)[0]) for f in names]

    def __len__(self) -> int:
        return len(self.frame_ids)

    def image_path(self, i: int) -> str:
        return os.path.join(
            self.seq_dir, "image_2", f"{self.frame_ids[i]:06d}.png"
        )

    def __getitem__(self, i: int) -> dict:
        return {"image": io.load_image(self.image_path(i)), "index": self.frame_ids[i]}

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]

    def gt_poses(self) -> Optional[np.ndarray]:
        """(N, 4, 4) cam-to-world GT, or None (seqs 11+ have no GT)."""
        path = os.path.join(self.root, "poses", f"{self.sequence}.txt")
        if not os.path.exists(path):
            return None
        poses = read_poses_file(path)
        return poses[np.asarray(self.frame_ids)]

    def calib(self) -> Optional[dict]:
        path = os.path.join(self.seq_dir, "calib.txt")
        return read_odometry_calib(path) if os.path.exists(path) else None


def pair_batches(dataset: KittiOdometryDataset, batch_size: int):
    """Consecutive (i, i+1) uint8 frame pairs, stacked (b, 2, H, W, 3).

    Frames are decoded once and carried over to the next pair; the last
    batch pads by repeating its final pair (``n_real`` marks the count),
    keeping the jitted pose program at one static batch shape.
    """
    prev = None
    buf: List[np.ndarray] = []
    for sample in dataset:
        img = sample["image"]
        if prev is not None:
            buf.append(np.stack([prev, img]))
            if len(buf) == batch_size:
                yield {"pairs": np.stack(buf), "n_real": batch_size}
                buf = []
        prev = img
    if buf:
        n_real = len(buf)
        while len(buf) < batch_size:
            buf.append(buf[-1])
        yield {"pairs": np.stack(buf), "n_real": n_real}
