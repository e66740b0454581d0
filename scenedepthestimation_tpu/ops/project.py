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


def bilinear_sample(
    img: jnp.ndarray, coords: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample img (B, H, W, C) at pixel coords (B, H, W, 2) (x, y).

    Border-clamped bilinear; returns (samples, in-frame validity mask).
    """
    b, h, w, c = img.shape
    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
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
    out = top * (1 - fy) + bot * fy

    valid = (
        (coords[..., 0] >= 0)
        & (coords[..., 0] <= w - 1)
        & (coords[..., 1] >= 0)
        & (coords[..., 1] <= h - 1)
    )
    return out, valid


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
