"""KITTI 2015 stereo dataset (SURVEY C5): 200 training pairs with
disp_occ_0 GT (16-bit PNG, value/256, 0 = invalid), rectified pairs at
``{root}/training/image_2|image_3/{idx:06d}_10.png``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional

import numpy as np

from scenedepthestimation_tpu.data import io


@dataclass
class Kitti2015Dataset:
    root: str
    split: str = "training"  # "training" | "testing"
    indices: Optional[List[int]] = None
    occ: bool = True  # disp_occ_0 (all px) vs disp_noc_0 (non-occluded)

    def __post_init__(self):
        if self.indices is None:
            img_dir = os.path.join(self.root, self.split, "image_2")
            names = sorted(
                f for f in os.listdir(img_dir) if f.endswith("_10.png")
            )
            self.indices = [int(f.split("_")[0]) for f in names]

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int) -> dict:
        idx = self.indices[i]
        base = os.path.join(self.root, self.split)
        name = f"{idx:06d}_10.png"
        sample = {
            "left": io.load_image(os.path.join(base, "image_2", name)),
            "right": io.load_image(os.path.join(base, "image_3", name)),
            "index": idx,
        }
        if self.split == "training":
            disp_dir = "disp_occ_0" if self.occ else "disp_noc_0"
            gt = io.load_depth_png16(os.path.join(base, disp_dir, name))
            sample["gt_disp"] = gt
            sample["valid"] = gt > 0
        return sample

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]


def batched(dataset: Kitti2015Dataset, batch_size: int):
    """Stack into full batches; KITTI-2015 frames are near-uniform but
    not identical in size — crop each batch to its min H/W (bottom/right
    crop keeps the road region, matching family convention)."""
    buf: List[dict] = []
    for sample in dataset:
        buf.append(sample)
        if len(buf) == batch_size:
            yield _stack(buf)
            buf = []
    if buf:
        yield _stack(buf)


def _stack(buf: List[dict]) -> dict:
    h = min(s["left"].shape[0] for s in buf)
    w = min(s["left"].shape[1] for s in buf)
    out = {
        "left": np.stack([s["left"][-h:, :w] for s in buf]),
        "right": np.stack([s["right"][-h:, :w] for s in buf]),
        "n_real": len(buf),
        "meta": [{"index": s["index"]} for s in buf],
    }
    if "gt_disp" in buf[0]:
        out["gt_disp"] = np.stack([s["gt_disp"][-h:, :w] for s in buf])
        out["valid"] = np.stack([s["valid"][-h:, :w] for s in buf])
    return out
