"""3-D reprojection ops for temporal self-supervised training
(SURVEY C14 photometric protocol, monodepth2 lineage).

Pipeline per source frame: backproject the predicted depth through the
inverse intrinsics, rigid-transform by the PoseNet estimate, project
through the intrinsics, and bilinear-sample the source frame at the
resulting pixel coordinates. All functions are jit/grad-friendly
(gathers only, static shapes) and batched (B, H, W, ...).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 3) homogeneous pixel coordinates (x, y, 1)."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    x, y = jnp.meshgrid(xs, ys)
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def backproject(depth: jnp.ndarray, k_inv: jnp.ndarray) -> jnp.ndarray:
    """depth (B, H, W), K^-1 (B, 3, 3) → camera-frame points (B, H, W, 3)."""
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)  # (H, W, 3)
    rays = jnp.einsum("bij,hwj->bhwi", k_inv, grid)
    return rays * depth[..., None]


def transform_points(points: jnp.ndarray, t_mat: jnp.ndarray) -> jnp.ndarray:
    """points (B, H, W, 3), T (B, 4, 4) rigid transform → (B, H, W, 3)."""
    rot = t_mat[:, :3, :3]
    trans = t_mat[:, :3, 3]
    return jnp.einsum("bij,bhwj->bhwi", rot, points) + trans[:, None, None, :]


def project(points: jnp.ndarray, k: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """points (B, H, W, 3), K (B, 3, 3) → pixel coords (B, H, W, 2)."""
    cam = jnp.einsum("bij,bhwj->bhwi", k, points)
    z = jnp.maximum(cam[..., 2:3], eps)
    return cam[..., :2] / z


# None = auto (corner-packed single gather on TPU, 4-gather elsewhere);
# bool = forced (tests pin parity between the two forms).
_USE_PACK4: bool | None = None


def set_use_pack4(flag: bool | None) -> None:
    global _USE_PACK4
    _USE_PACK4 = flag


def _corner_coords(coords: jnp.ndarray, h: int, w: int):
    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    return (
        x0.astype(jnp.int32),
        y0.astype(jnp.int32),
        (x - x0)[..., None],
        (y - y0)[..., None],
    )


def _sample_gather4(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = img.shape
    ix0, iy0, fx, fy = _corner_coords(coords, h, w)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)

    flat = img.reshape(b, h * w, c)

    def gather(iy, ix):
        idx = iy * w + ix  # (B, H, W)
        return jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(b, h, w, c)

    top = gather(iy0, ix0) * (1 - fx) + gather(iy0, ix1) * fx
    bot = gather(iy1, ix0) * (1 - fx) + gather(iy1, ix1) * fx
    return top * (1 - fy) + bot * fy


def _sample_pack4(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """ONE gather of a 4-corner-packed (B, HW, 4C) table at the (y0, x0)
    index. TPU gather cost is per-index (measured ~10.6 ns/idx at 48 B
    rows, bench/probe_project.py): four C=3 gathers cost 35.4 ms at
    (8, 192, 640) while one 4C=12 gather costs 10.4 ms — 3.4x, exact to
    the bit. The edge-clamped right/down/down-right shifts ARE the
    clamped ix1/iy1 samples (min(i+1, n-1) commutes with the shift —
    the same lemma ops/warp.py uses along W)."""
    b, h, w, c = img.shape
    ix0, iy0, fx, fy = _corner_coords(coords, h, w)
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    table = jnp.concatenate([img, right, down, downright], axis=-1)
    idx = (iy0 * w + ix0).reshape(b, -1, 1)
    g = jnp.take_along_axis(table.reshape(b, h * w, 4 * c), idx, axis=1)
    g = g.reshape(b, h, w, 4 * c)
    c00, c01 = g[..., :c], g[..., c : 2 * c]
    c10, c11 = g[..., 2 * c : 3 * c], g[..., 3 * c :]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def bilinear_sample(
    img: jnp.ndarray, coords: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample img (B, H, W, C) at pixel coords (B, H, W, 2) (x, y).

    Border-clamped bilinear; returns (samples, in-frame validity mask).
    Gradients flow into ``coords`` through the lerp weights (and into
    ``img`` through the gather/table, unless the caller stops it).
    """
    use_pack4 = _USE_PACK4
    if use_pack4 is None:
        use_pack4 = jax.default_backend() == "tpu"
    sample = _sample_pack4 if use_pack4 else _sample_gather4
    out = sample(img, coords)

    valid = (
        (coords[..., 0] >= 0)
        & (coords[..., 0] <= img.shape[2] - 1)
        & (coords[..., 1] >= 0)
        & (coords[..., 1] <= img.shape[1] - 1)
    )
    return out, valid


# ---------------------------------------------------------------------------
# Channels-first (W-minor) path for the temporal training loss.
#
# Every (B, H, W, 3) NHWC intermediate in the reprojection pipeline is
# lane-padded 3 -> 128 on TPU (a 42x memory-traffic tax on each
# elementwise op). The loss-side rewrite keeps channels FIRST —
# (B, 3, H, W), W minor, 640 = 5 full lanes — so point math, lerps and
# SSIM run at full lane utilization, and the bilinear residuals become
# compact enough to keep live (no jax.checkpoint / no recomputed
# gathers in the backward). The gather itself stays in corner-packed
# (B, HW, 4C) form (measured fastest, see _sample_pack4).
# ---------------------------------------------------------------------------


def pack4_table(img: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) NHWC source frame → corner-packed (B, H*W, 4C)
    gather table [c00, c01, c10, c11]. Depth/pose-independent: built
    ONCE per source frame and shared by every scale's reprojection."""
    b, h, w, c = img.shape
    right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
    down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    table = jnp.concatenate([img, right, down, downright], axis=-1)
    return table.reshape(b, h * w, 4 * c)


def reproject_coords(
    depth: jnp.ndarray,
    k: jnp.ndarray,
    k_inv: jnp.ndarray,
    t_mat: jnp.ndarray,
    eps: float = 1e-7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """depth (B, H, W) → source-view pixel coords as two W-minor maps
    (x, y), each (B, H, W). Same math as backproject→transform→project,
    with every 3x3 matrix product UNROLLED into elementwise broadcast
    arithmetic. The einsum form lowered these as dot_generals, and the
    dots' layout preference propagated a batch-minor {0,2,1:T(8,128)}
    layout (B=8 padded to 128 lanes, ~16x traffic) through the ENTIRE
    temporal-loss subgraph, which in turn tripped XLA's remat pass
    (12 ms fusions re-run 5-6x; device trace in bench/trace_temporal.py,
    round-3 BASELINE notes). Elementwise-only keeps the natural W-minor
    layout end to end."""
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype)  # (H, W, 3); [..., 2] is ones
    gx, gy = grid[..., 0], grid[..., 1]  # (H, W)

    def col(m, i, j):  # (B, 1, 1) broadcast scalar of a (B, 3, 3)-ish mat
        return m[:, i, j][:, None, None]

    # rays_i = k_inv[i,0]*gx + k_inv[i,1]*gy + k_inv[i,2]
    rays = [
        col(k_inv, i, 0) * gx + col(k_inv, i, 1) * gy + col(k_inv, i, 2)
        for i in range(3)
    ]
    # pts_i = rays_i * depth;  pts'_i = sum_j rot[i,j]*pts_j + trans_i
    pts = [r * depth for r in rays]
    moved = [
        col(t_mat, i, 0) * pts[0]
        + col(t_mat, i, 1) * pts[1]
        + col(t_mat, i, 2) * pts[2]
        + t_mat[:, i, 3][:, None, None]
        for i in range(3)
    ]
    # cam_i = sum_j k[i,j] * moved_j
    def cam(i):
        return (
            col(k, i, 0) * moved[0]
            + col(k, i, 1) * moved[1]
            + col(k, i, 2) * moved[2]
        )

    z = jnp.maximum(cam(2), eps)
    return cam(0) / z, cam(1) / z


def sample_table_cfirst(
    table: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, h: int, w: int
) -> jnp.ndarray:
    """Bilinear-sample a pack4_table at W-minor coords x, y (B, H, W)
    → channels-first samples (B, C, H, W). Bit-identical values to
    bilinear_sample (same corners, same lerp)."""
    b = table.shape[0]
    c = table.shape[-1] // 4
    xc = jnp.clip(x, 0.0, w - 1.0)
    yc = jnp.clip(y, 0.0, h - 1.0)
    x0 = jnp.floor(xc)
    y0 = jnp.floor(yc)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    fx = (xc - x0)[:, None]  # (B, 1, H, W)
    fy = (yc - y0)[:, None]
    idx = (iy0 * w + ix0).reshape(b, -1, 1)
    g = jnp.take_along_axis(table, idx, axis=1)  # (B, HW, 4C)
    g = g.reshape(b, h, w, 4 * c).transpose(0, 3, 1, 2)  # (B, 4C, H, W)
    c00, c01 = g[:, :c], g[:, c : 2 * c]
    c10, c11 = g[:, 2 * c : 3 * c], g[:, 3 * c :]
    top = c00 * (1 - fx) + c01 * fx
    bot = c10 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy


def reproject_sample(
    src_img: jnp.ndarray,
    depth: jnp.ndarray,
    k: jnp.ndarray,
    k_inv: jnp.ndarray,
    t_mat: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full warp: target depth + pose → source frame sampled into the
    target view. Returns (reconstruction, validity)."""
    points = backproject(depth, k_inv)
    points = transform_points(points, t_mat)
    coords = project(points, k)
    return bilinear_sample(src_img, coords)


def pose_vec_to_mat(
    axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False
) -> jnp.ndarray:
    """(B, 3) axis-angle + (B, 3) translation → (B, 4, 4) SE(3).

    Rodrigues' rotation; ``invert=True`` returns the inverse transform
    (the monodepth2 convention for frames earlier than the target).
    """
    b = axisangle.shape[0]
    angle = jnp.linalg.norm(axisangle, axis=-1, keepdims=True)  # (B, 1)
    axis = axisangle / jnp.maximum(angle, 1e-7)
    ca = jnp.cos(angle)[..., None]  # (B, 1, 1)
    sa = jnp.sin(angle)[..., None]
    c1 = 1.0 - ca

    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    zeros = jnp.zeros_like(x)
    skew = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=1,
    )  # (B, 3, 3)
    outer = axis[:, :, None] * axis[:, None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axisangle.dtype), (b, 3, 3))
    rot = ca * eye + sa * skew + c1 * outer

    t = translation
    if invert:
        rot = jnp.swapaxes(rot, 1, 2)
        t = -jnp.einsum("bij,bj->bi", rot, translation)

    mat = jnp.concatenate([rot, t[:, :, None]], axis=-1)  # (B, 3, 4)
    last = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], axisangle.dtype), (b, 1, 4)
    )
    return jnp.concatenate([mat, last], axis=1)
