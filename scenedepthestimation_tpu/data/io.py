"""Host-side image/GT decode (SURVEY C1).

The ONLY place pixel bytes are touched on the host (BASELINE.json:5
"host never touches pixel tensors after decode"): PNG/JPEG → uint8
arrays, 16-bit KITTI depth/disparity PNGs → float32, velodyne .bin +
calib → projected depth maps. Everything downstream is device-resident.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

# Native C++ PNG decoder (native/png_decode.cc): zlib inflate + unfilter
# with the GIL released — the feed thread's decode truly overlaps JAX
# dispatch on this 1-core host. Optional: PIL fallback below.
try:
    from scenedepthestimation_tpu import _native
except ImportError:  # pure-Python install
    _native = None

_FORCE_PIL = False  # test hook


def _native_decode(path: str) -> Optional[np.ndarray]:
    """Decode a PNG via the C++ extension; None → caller falls back."""
    if _native is None or _FORCE_PIL or not path.endswith(".png"):
        return None
    with open(path, "rb") as f:
        data = f.read()
    try:
        pixels, w, h, channels, bit_depth = _native.decode_png(data)
    except ValueError:
        return None  # unsupported variant (palette/interlace/...)
    if bit_depth == 8:
        return np.frombuffer(pixels, np.uint8).reshape(h, w, channels)
    # 16-bit gray, PNG is big-endian.
    return np.frombuffer(pixels, ">u2").reshape(h, w).astype(np.uint16)


def load_image(path: str) -> np.ndarray:
    """RGB uint8 (H, W, 3)."""
    arr = _native_decode(path)
    if arr is not None and arr.dtype == np.uint8:
        if arr.shape[-1] == 3:
            return arr
        if arr.shape[-1] == 4:
            return np.ascontiguousarray(arr[..., :3])
        if arr.shape[-1] in (1, 2):  # gray / gray+alpha
            return np.repeat(arr[..., :1], 3, axis=-1)
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def load_depth_png16(path: str, scale: float = 256.0) -> np.ndarray:
    """KITTI 16-bit depth/disparity PNG → float32, 0 = invalid.

    KITTI stores depth (annotated GT) and KITTI-2015 disparity as
    uint16 = value * 256 (SURVEY C1).
    """
    arr = _native_decode(path)
    if arr is None or arr.dtype != np.uint16:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im)
    if arr.dtype != np.uint16:
        raise ValueError(f"{path}: expected 16-bit PNG, got {arr.dtype}")
    return arr.astype(np.float32) / scale


# ---------------------------------------------------------------------------
# KITTI calibration + velodyne→depth projection (SURVEY C3 "GT depth via
# velodyne projection"). Standard Eigen-split protocol.
# ---------------------------------------------------------------------------


def read_calib_file(path: str) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            try:
                out[key.strip()] = np.asarray(
                    [float(x) for x in value.split()], dtype=np.float64
                )
            except ValueError:
                pass  # non-numeric entries (dates)
    return out


def load_velodyne_points(path: str) -> np.ndarray:
    """(N, 4) x,y,z,reflectance float32."""
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    pts[:, 3] = 1.0  # homogeneous
    return pts


def velodyne_to_depth(
    velo_path: str,
    calib_dir: str,
    cam: int = 2,
    image_hw: Tuple[int, int] = (375, 1242),
) -> np.ndarray:
    """Project velodyne scan into camera ``cam`` → sparse depth (H, W).

    Pipeline: velo → (Tr_velo_to_cam) → cam0 → (R_rect_00) → rectified →
    (P_rect_0N) → pixels. Points behind the camera are dropped; multiple
    hits per pixel keep the MINIMUM depth (standard Eigen protocol).
    """
    cam2cam = read_calib_file(os.path.join(calib_dir, "calib_cam_to_cam.txt"))
    velo2cam_f = read_calib_file(os.path.join(calib_dir, "calib_velo_to_cam.txt"))

    velo2cam = np.eye(4)
    velo2cam[:3, :3] = velo2cam_f["R"].reshape(3, 3)
    velo2cam[:3, 3] = velo2cam_f["T"]

    r_rect = np.eye(4)
    r_rect[:3, :3] = cam2cam["R_rect_00"].reshape(3, 3)

    p_rect = cam2cam[f"P_rect_0{cam}"].reshape(3, 4)
    proj = p_rect @ r_rect @ velo2cam  # (3, 4)

    velo = load_velodyne_points(velo_path)
    velo = velo[velo[:, 0] >= 0.1]  # points in front of the sensor

    pix = (proj @ velo.T).T  # (N, 3)
    depth = pix[:, 2]
    # The KITTI MATLAB devkit (and the Eigen-protocol generate_depth_map
    # implementations that follow it) index pixels 1-based; matching the
    # standard placement requires round(...) - 1 (ADVICE r1, medium).
    u = np.round(pix[:, 0] / depth).astype(np.int64) - 1
    v = np.round(pix[:, 1] / depth).astype(np.int64) - 1

    h, w = image_hw
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (depth > 0)
    u, v, depth = u[ok], v[ok], depth[ok]

    out = np.zeros((h, w), dtype=np.float32)
    # keep min depth per pixel: sort descending so the min lands last
    order = np.argsort(-depth)
    out[v[order], u[order]] = depth[order]
    return out


def kitti_intrinsics(calib_dir: str, cam: int = 2) -> Dict[str, float]:
    """Full pinhole intrinsics + stereo baseline from a KITTI calib dir
    (SURVEY C8): fx/fy/cx/cy of the requested rectified camera and the
    cam2↔cam3 baseline in meters."""
    cam2cam = read_calib_file(os.path.join(calib_dir, "calib_cam_to_cam.txt"))
    p_cam = cam2cam[f"P_rect_0{cam}"].reshape(3, 4)
    p2 = cam2cam["P_rect_02"].reshape(3, 4)
    p3 = cam2cam["P_rect_03"].reshape(3, 4)
    fx = float(p2[0, 0])
    # Baseline between rectified cam2/cam3: b = -(tx3 - tx2)/fx.
    baseline = float((p2[0, 3] - p3[0, 3]) / fx)
    out = {
        "focal_px": float(p_cam[0, 0]),
        "fy_px": float(p_cam[1, 1]),
        "cx_px": float(p_cam[0, 2]),
        "cy_px": float(p_cam[1, 2]),
        "baseline_m": baseline,
    }
    # Rectified image size (S_rect_0N: "width height") — the resolution
    # the intrinsics above are expressed at. Callers predicting on a
    # resized frame rescale fx,cx by out_w/width and fy,cy by
    # out_h/height. Optional: some (synthetic) calib files omit it.
    s_rect = cam2cam.get(f"S_rect_0{cam}")
    if s_rect is not None and s_rect.size == 2:
        out["width_px"] = float(s_rect[0])
        out["height_px"] = float(s_rect[1])
    return out
