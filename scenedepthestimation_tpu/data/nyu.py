"""NYUv2 indoor RGB-D dataset (SURVEY C4): 480x640 frames.

Two on-disk layouts are accepted:

* extracted PNG pairs: ``{root}/rgb/*.png`` + ``{root}/depth/*.png``
  (16-bit depth in millimeters — the common extraction convention);
* the official labeled .mat (requires h5py — gated import; this image
  may not ship it).

Eval protocol: center crop (Eigen NYU crop) + depth cap 10 m
(UNVERIFIED vs reference — standard NYU protocol).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from scenedepthestimation_tpu.data import io

# Standard NYU eval crop (Eigen): rows 45..471, cols 41..601.
NYU_CROP = (45, 471, 41, 601)
NYU_MAX_DEPTH = 10.0


@dataclass
class NyuDataset:
    root: str
    depth_scale: float = 1000.0  # uint16 mm → m

    def __post_init__(self):
        rgb_dir = os.path.join(self.root, "rgb")
        if os.path.isdir(rgb_dir):
            self.names = sorted(
                os.path.splitext(f)[0]
                for f in os.listdir(rgb_dir)
                if f.endswith((".png", ".jpg"))
            )
            self._mat = None
        else:
            mat = [f for f in os.listdir(self.root) if f.endswith(".mat")]
            if not mat:
                raise FileNotFoundError(
                    f"no rgb/ dir and no .mat file under {self.root}"
                )
            self._mat = os.path.join(self.root, mat[0])
            import h5py  # gated: not guaranteed in this image

            with h5py.File(self._mat, "r") as f:
                self._n = f["images"].shape[0]
            self.names = [str(i) for i in range(self._n)]

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, i: int) -> dict:
        if self._mat is None:
            name = self.names[i]
            rgb_dir = os.path.join(self.root, "rgb")
            ext = ".png" if os.path.exists(os.path.join(rgb_dir, name + ".png")) else ".jpg"
            image = io.load_image(os.path.join(rgb_dir, name + ext))
            depth_path = os.path.join(self.root, "depth", name + ".png")
            sample = {"image": image, "index": i, "name": name}
            if os.path.exists(depth_path):
                from PIL import Image

                with Image.open(depth_path) as im:
                    d = np.asarray(im).astype(np.float32)
                sample["gt_depth"] = d / self.depth_scale
            return sample
        import h5py

        with h5py.File(self._mat, "r") as f:
            image = np.transpose(f["images"][i], (2, 1, 0))  # → H W 3
            depth = np.transpose(f["depths"][i], (1, 0)).astype(np.float32)
        return {"image": image, "gt_depth": depth, "index": i, "name": str(i)}

    def __iter__(self) -> Iterator[dict]:
        for i in range(len(self)):
            yield self[i]
