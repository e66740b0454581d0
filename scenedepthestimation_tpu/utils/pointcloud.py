"""Depth → 3-D point-cloud export (reference-family capability: the
monodepth2-lineage repos ship `test_simple`-style prediction dumps and a
point-cloud/PLY export of the back-projected depth; SURVEY §2 C8/C19 —
"predict a depth map from a single image" + depth-map dump).

Host-side NumPy on the already-downloaded depth map: back-projection is
O(H·W) elementwise — not worth a device round trip after the depth has
left the chip (the jitted program's output is the depth map; SURVEY
§3.1's host↔device contract is raw-bytes-in / depth-out).

No dependencies beyond NumPy: the PLY is written directly (binary
little-endian by default — 1/3 the bytes of ASCII and loads in any
viewer: MeshLab, Open3D, CloudCompare).
"""

from __future__ import annotations

import struct
from typing import Dict, Optional

import numpy as np

__all__ = [
    "default_intrinsics",
    "backproject_depth",
    "write_ply",
    "depth_to_pointcloud_ply",
    "normals_from_depth",
    "normals_to_rgb",
]


def default_intrinsics(height: int, width: int) -> Dict[str, float]:
    """Family-conventional normalized KITTI pinhole (monodepth2's
    resolution-independent K: fx=0.58·W, fy=1.92·H, cx=0.5·W,
    cy=0.5·H) scaled to the given image size. Used when no calib dir
    is supplied; correct for full-frame KITTI cam-2 crops, approximate
    otherwise."""
    return {
        "fx": 0.58 * width,
        "fy": 1.92 * height,
        "cx": 0.5 * width,
        "cy": 0.5 * height,
    }


def backproject_depth(
    depth: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> np.ndarray:
    """Back-project an (H, W) metric depth map to (H, W, 3) camera-frame
    points: X = (u−cx)·Z/fx, Y = (v−cy)·Z/fy, Z = depth. Camera
    convention is +Z forward, +X right, +Y DOWN (image axes) — the
    rectified-KITTI convention the intrinsics are expressed in."""
    depth = np.asarray(depth, dtype=np.float32)
    if depth.ndim != 2:
        raise ValueError(f"depth must be (H, W), got {depth.shape}")
    h, w = depth.shape
    u = np.arange(w, dtype=np.float32)[None, :]
    v = np.arange(h, dtype=np.float32)[:, None]
    x = (u - np.float32(cx)) * depth / np.float32(fx)
    y = (v - np.float32(cy)) * depth / np.float32(fy)
    return np.stack([x, y, depth], axis=-1)


def write_ply(
    path: str,
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    binary: bool = True,
) -> int:
    """Write an (N, 3) float32 point array (optionally with (N, 3) uint8
    colors) as a PLY file. Returns the vertex count."""
    pts = np.ascontiguousarray(points, dtype=np.float32).reshape(-1, 3)
    n = pts.shape[0]
    has_color = colors is not None
    if has_color:
        col = np.asarray(colors)
        if np.issubdtype(col.dtype, np.floating):
            # Float RGB: [0,1] convention (scale), else assume 0-255
            # floats (round). A raw uint8 cast would truncate a [0,1]
            # image to {0,1} — a near-black cloud instead of an error.
            if col.size and float(np.nanmax(col)) <= 1.0:
                col = col * 255.0
            col = np.clip(np.round(col), 0, 255)
        elif col.dtype != np.uint8:
            if col.size and (col.min() < 0 or col.max() > 255):
                raise ValueError(
                    f"integer colors must be in [0, 255], got range "
                    f"[{col.min()}, {col.max()}]"
                )
        col = np.ascontiguousarray(col, dtype=np.uint8).reshape(-1, 3)
        if col.shape[0] != n:
            raise ValueError(
                f"colors ({col.shape[0]}) must match points ({n})"
            )
    header = ["ply"]
    header.append(
        "format binary_little_endian 1.0" if binary else "format ascii 1.0"
    )
    header.append(f"element vertex {n}")
    header += ["property float x", "property float y", "property float z"]
    if has_color:
        header += [
            "property uchar red",
            "property uchar green",
            "property uchar blue",
        ]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if binary:
            if has_color:
                # Interleave: 12 bytes xyz + 3 bytes rgb per vertex.
                rec = np.zeros(n, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
                rec["xyz"] = pts
                rec["rgb"] = col
                f.write(rec.tobytes())
            else:
                f.write(pts.astype("<f4").tobytes())
        else:
            for i in range(n):
                line = "%.6f %.6f %.6f" % tuple(pts[i])
                if has_color:
                    line += " %d %d %d" % tuple(int(c) for c in col[i])
                f.write((line + "\n").encode("ascii"))
    return n


def normals_from_depth(
    depth: np.ndarray,
    intrinsics: Optional[Dict[str, float]] = None,
) -> np.ndarray:
    """Per-pixel unit surface normals from an (H, W) metric depth map:
    central-difference tangents of the back-projected point map, crossed
    and oriented toward the camera (n·p < 0 — a visible surface faces
    the origin). Returns (H, W, 3) float32; edge rows/cols reuse their
    neighbors' one-sided differences (np.gradient)."""
    depth = np.asarray(depth, dtype=np.float32)
    h, w = depth.shape
    intr = intrinsics or default_intrinsics(h, w)
    pts = backproject_depth(depth, intr["fx"], intr["fy"], intr["cx"], intr["cy"])
    # Tangents along image axes: d(points)/du (axis 1) and /dv (axis 0).
    tv, tu = np.gradient(pts, axis=(0, 1))
    n = np.cross(tu, tv)
    # Orient toward the camera, then normalize (guard flat/zero cells).
    flip = np.sign(np.sum(n * pts, axis=-1, keepdims=True))
    n = -n * np.where(flip == 0.0, 1.0, flip)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    return (n / np.maximum(norm, 1e-12)).astype(np.float32)


def normals_to_rgb(normals: np.ndarray) -> np.ndarray:
    """Map unit normals [-1, 1] to the conventional RGB visualization
    (0.5·n + 0.5 per channel) as (H, W, 3) uint8."""
    vis = np.clip(np.asarray(normals) * 0.5 + 0.5, 0.0, 1.0)
    return (vis * 255.0 + 0.5).astype(np.uint8)


def depth_to_pointcloud_ply(
    path: str,
    depth: np.ndarray,
    image: Optional[np.ndarray] = None,
    intrinsics: Optional[Dict[str, float]] = None,
    max_depth: float = 80.0,
    binary: bool = True,
) -> int:
    """One-call export: back-project ``depth`` (H, W), color from
    ``image`` (H, W, 3) uint8 when given, drop points beyond
    ``max_depth`` (the Eigen-protocol far cap — sky/void pixels whose
    1/sigmoid depth saturates), write PLY. Returns vertices written."""
    depth = np.asarray(depth, dtype=np.float32)
    h, w = depth.shape
    intr = intrinsics or default_intrinsics(h, w)
    pts = backproject_depth(depth, intr["fx"], intr["fy"], intr["cx"], intr["cy"])
    valid = np.isfinite(depth) & (depth > 0.0) & (depth <= max_depth)
    pts = pts[valid]
    col = None
    if image is not None:
        image = np.asarray(image)
        if image.shape[:2] != (h, w):
            raise ValueError(
                f"image {image.shape[:2]} must match depth {(h, w)}"
            )
        col = image.reshape(h, w, 3)[valid]
    return write_ply(path, pts, col, binary=binary)
