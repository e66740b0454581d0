"""Training losses (SURVEY C14).

The reference's training protocol is unverifiable (mount empty); SURVEY
§2 C14 pins the capability surface for the family: supervised L1/SmoothL1
on disparity (stereo), and monocular supervised-vs-GT and/or
self-supervised photometric (SSIM + L1) with edge-aware smoothness at
multiple scales (monodepth2 lineage). Both are implemented; all are pure
jit-able functions.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from scenedepthestimation_tpu.ops.upsample import upsample2x


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean pool, stride 1, VALID — the SSIM local window (NHWC).

    Separable slice+add instead of lax.reduce_window for the same
    reason as ``_avg_pool3_cf`` below: TPU layout assignment favors
    putting a reduce-window's NON-windowed dims (here B and C=3) in the
    vector lanes, a padded layout that propagates into the surrounding
    loss subgraph. Slices keep the natural layout; the math is exact."""
    s = x[:, :, :-2] + x[:, :, 1:-1] + x[:, :, 2:]   # W window
    s = s[:, :-2] + s[:, 1:-1] + s[:, 2:]            # H window
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM dissimilarity (1-SSIM)/2, monodepth2-style 3x3.

    Inputs (B, H, W, C) in [0, 1]; output (B, H-2, W-2, C) in [0, 1].
    """
    c1, c2 = 0.01**2, 0.03**2
    mu_x, mu_y = _avg_pool3(x), _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - num / den) * 0.5, 0.0, 1.0)


def photometric_error(
    pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.85
) -> jnp.ndarray:
    """alpha*SSIM + (1-alpha)*L1, reduced over channels → (B, H-2, W-2)."""
    l1 = jnp.mean(jnp.abs(pred - target), axis=-1)[:, 1:-1, 1:-1]
    ss = jnp.mean(ssim(pred, target), axis=-1)
    return alpha * ss + (1.0 - alpha) * l1


def edge_aware_smoothness(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Mean edge-aware disparity smoothness (monodepth2 get_smooth_loss).

    disp (B, H, W, 1) is mean-normalized; image gradients down-weight
    penalties across edges.
    """
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    d = disp / (mean_disp + 1e-7)
    dx = jnp.abs(d[:, :, 1:, :] - d[:, :, :-1, :])
    dy = jnp.abs(d[:, 1:, :, :] - d[:, :-1, :, :])
    ix = jnp.mean(jnp.abs(img[:, :, 1:, :] - img[:, :, :-1, :]), axis=-1, keepdims=True)
    iy = jnp.mean(jnp.abs(img[:, 1:, :, :] - img[:, :-1, :, :]), axis=-1, keepdims=True)
    dx = dx * jnp.exp(-ix)
    dy = dy * jnp.exp(-iy)
    return jnp.mean(dx) + jnp.mean(dy)


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """Elementwise SmoothL1/Huber (torch convention)."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)


def mono_supervised_loss(
    disps: Dict[int, jnp.ndarray],
    gt_disp: jnp.ndarray,
    image: jnp.ndarray,
    smoothness_weight: float = 1e-3,
) -> jnp.ndarray:
    """Multi-scale supervised L1 on sigmoid disparity + smoothness.

    ``gt_disp`` (B, H, W, 1) in the network's [0, 1] sigmoid units, valid
    where > 0. Each scale's prediction is upsampled to full res (the
    monodepth2 full-res multi-scale protocol) before the comparison; the
    smoothness term uses the per-scale disparity against the full image.
    """
    valid = (gt_disp > 0).astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(valid), 1.0)
    total = 0.0
    n_scales = len(disps)
    for s, disp in sorted(disps.items()):
        d = disp
        for _ in range(s):
            d = upsample2x(d, mode="bilinear")
        l1 = jnp.sum(jnp.abs(d - gt_disp) * valid) / denom
        smooth = edge_aware_smoothness(disp, _downsample_image(image, s))
        total = total + l1 + smoothness_weight * smooth / (2.0**s)
    return total / n_scales


def _downsample_image(img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """2x area downsample applied ``scale`` times (for per-scale terms).

    Strided slices + add instead of reduce_window (layout note on
    ``_avg_pool3``); exact same math."""
    for _ in range(scale):
        h, w = img.shape[1] // 2 * 2, img.shape[2] // 2 * 2  # VALID trim
        img = img[:, :h, :w]
        img = (
            img[:, 0::2, 0::2] + img[:, 0::2, 1::2]
            + img[:, 1::2, 0::2] + img[:, 1::2, 1::2]
        ) * 0.25
    return img


def stereo_supervised_loss(
    pred_disp: jnp.ndarray,
    gt_disp: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Masked SmoothL1 on full-res disparity in px (KITTI-2015 training)."""
    v = valid.astype(jnp.float32)
    per_px = smooth_l1(pred_disp, gt_disp) * v
    return jnp.sum(per_px) / jnp.maximum(jnp.sum(v), 1.0)


def disparity_classification_loss(
    cost: jnp.ndarray,
    gt_disp: jnp.ndarray,
    valid: jnp.ndarray,
    stride: int,
    temperature: float = 1.0,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Gaussian-smoothed cross-entropy on the cost-volume softmax — the
    structural anchor against the soft-argmin uniform-softmax collapse
    (AcfNet / stereo-focal-loss lineage; BASELINE.md round-3 collapse
    study: at lr 1e-3 the regression loss alone collapses seed-
    dependently and neither warmup nor temperature rescues it, because
    the uniform softmax is a flat region of the REGRESSION loss — its
    expectation stays D/2 under any symmetric perturbation. The CE term
    breaks that flatness per-pixel.)

    ``cost`` (B, h, w, D) matching-cost logits at feature resolution
    (lower = better, the soft-argmin convention); ``gt_disp`` (B, H, W)
    full-res px; ``valid`` (B, H, W) bool. The target distribution is a
    normalized Gaussian over disparity bins centered at gt/stride.
    """
    d = cost.shape[-1]
    gt_bin = gt_disp[:, ::stride, ::stride].astype(jnp.float32) / float(stride)
    v = valid[:, ::stride, ::stride] & (gt_bin <= d - 1) & (gt_bin >= 0)
    bins = jnp.arange(d, dtype=jnp.float32)
    target = jax.nn.softmax(
        -((bins - gt_bin[..., None]) ** 2) / (2.0 * sigma**2), axis=-1
    )
    logp = jax.nn.log_softmax(
        -cost.astype(jnp.float32) / temperature, axis=-1
    )
    ce = -jnp.sum(target * logp, axis=-1)
    vf = v.astype(jnp.float32)
    return jnp.sum(ce * vf) / jnp.maximum(jnp.sum(vf), 1.0)


# --- channels-first ((B, C, H, W), W-minor) loss kernels -------------------
# On TPU every elementwise/window op on an NHWC C=3 array pays a
# 3->128 lane-padding tax (~42x memory traffic). The temporal loss is
# ~20 such full-res traversals per (scale, source); channels-first they
# run at full lanes (W=640 = 5x128). Same math, verified bit-close in
# tests/test_project.py.


def _avg_pool3_cf(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 mean pool, stride 1, VALID, on (B, C, H, W).

    Separable slice+add instead of lax.reduce_window: TPU layout
    assignment puts a reduce-window's NON-windowed dims in the vector
    lanes, and with (B, C) = (8, 3) that is a 24->512 padded tile
    (~21x traffic) whose layout then propagates through the whole
    temporal-loss subgraph and trips the HLO remat pass (device trace:
    12 ms multiply_add fusions re-run 5-6x; bench/hlo_layout_hunt.py
    pinned the origin to this op). Slices along H/W keep the natural
    W-minor layout and the same math exactly."""
    s = x[..., :-2] + x[..., 1:-1] + x[..., 2:]          # W window
    s = s[..., :-2, :] + s[..., 1:-1, :] + s[..., 2:, :]  # H window
    return s / 9.0


def ssim_cf(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """ssim() on channels-first inputs → (B, C, H-2, W-2)."""
    c1, c2 = 0.01**2, 0.03**2
    mu_x, mu_y = _avg_pool3_cf(x), _avg_pool3_cf(y)
    sigma_x = _avg_pool3_cf(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3_cf(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3_cf(x * y) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - num / den) * 0.5, 0.0, 1.0)


def photometric_error_cf(
    pred: jnp.ndarray, target: jnp.ndarray, alpha: float = 0.85
) -> jnp.ndarray:
    """photometric_error() on (B, C, H, W) inputs → (B, H-2, W-2)."""
    l1 = jnp.mean(jnp.abs(pred - target), axis=1)[:, 1:-1, 1:-1]
    ss = jnp.mean(ssim_cf(pred, target), axis=1)
    return alpha * ss + (1.0 - alpha) * l1


def edge_aware_smoothness_cf(
    disp: jnp.ndarray, img_cf: jnp.ndarray
) -> jnp.ndarray:
    """edge_aware_smoothness() with disp (B, H, W) and image
    (B, C, H, W) — identical value, no C-minor arrays."""
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    d = disp / (mean_disp + 1e-7)
    dx = jnp.abs(d[:, :, 1:] - d[:, :, :-1])
    dy = jnp.abs(d[:, 1:] - d[:, :-1])
    ix = jnp.mean(jnp.abs(img_cf[..., 1:] - img_cf[..., :-1]), axis=1)
    iy = jnp.mean(jnp.abs(img_cf[:, :, 1:] - img_cf[:, :, :-1]), axis=1)
    dx = dx * jnp.exp(-ix)
    dy = dy * jnp.exp(-iy)
    return jnp.mean(dx) + jnp.mean(dy)


# None = auto (channels-first on TPU, NHWC elsewhere); bool = forced
# (tests pin parity between the two forms).
_USE_CFIRST: bool | None = None


def set_use_cfirst(flag: bool | None) -> None:
    global _USE_CFIRST
    _USE_CFIRST = flag


def _temporal_loss_cfirst(
    disps,
    target: jnp.ndarray,
    sources,
    t_mats,
    k: jnp.ndarray,
    k_inv: jnp.ndarray,
    min_depth: float,
    max_depth: float,
    smoothness_weight: float,
) -> jnp.ndarray:
    """Channels-first body of mono_temporal_selfsup_loss. Differences
    from the NHWC body are layout-only: corner tables hoisted out of
    the scale loop (depth-independent), W-minor point math/lerps/SSIM,
    and NO jax.checkpoint — the residuals that OOM'd in NHWC (42x
    lane-padded corner/SSIM intermediates) are compact here, so the
    backward reuses them instead of re-running the gathers."""
    from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth
    from scenedepthestimation_tpu.ops.project import (
        pack4_table,
        reproject_coords,
        sample_table_cfirst,
    )
    from scenedepthestimation_tpu.ops.upsample import upsample2x_rank3

    h, w = target.shape[1:3]
    target_cf = target.transpose(0, 3, 1, 2)
    src_cf = [jax.lax.stop_gradient(s).transpose(0, 3, 1, 2) for s in sources]
    identity_errs = [
        photometric_error_cf(s, target_cf) + 1e-5 for s in src_cf
    ]
    tables = [pack4_table(jax.lax.stop_gradient(s)) for s in sources]

    total = 0.0
    for s, disp in sorted(disps.items()):
        d = disp.astype(jnp.float32)[..., 0]  # (B, h_s, w_s)
        for _ in range(s):
            d = upsample2x_rank3(d)
        _, depth = disp_to_depth(d, min_depth, max_depth)

        reproj_errs = []
        for table, t_mat in zip(tables, t_mats):
            x, y = reproject_coords(depth, k, k_inv, t_mat)
            recon = sample_table_cfirst(table, x, y, h, w)
            reproj_errs.append(photometric_error_cf(recon, target_cf))
        all_errs = jnp.stack(reproj_errs + identity_errs, axis=0)
        min_err = jnp.min(all_errs, axis=0)  # (B, H-2, W-2)

        smooth = edge_aware_smoothness_cf(d, target_cf)
        total = total + jnp.mean(min_err) + smoothness_weight * smooth / (2.0**s)
    return total / len(disps)


def mono_temporal_selfsup_loss(
    disps,
    target: jnp.ndarray,
    sources,
    t_mats,
    k: jnp.ndarray,
    k_inv: jnp.ndarray,
    min_depth: float,
    max_depth: float,
    smoothness_weight: float = 1e-3,
) -> jnp.ndarray:
    """monodepth2 temporal photometric loss (SURVEY C14): per scale,
    upsample disparity to full res, convert to depth, reproject every
    source frame into the target view, take the per-pixel MINIMUM
    photometric error over sources AND over identity reprojections
    (automasking of static pixels / moving objects), plus edge-aware
    smoothness decayed by scale.

    disps: {scale: (B, h_s, w_s, 1) sigmoid}; target (B, H, W, 3) [0,1];
    sources: list of (B, H, W, 3); t_mats: list of (B, 4, 4).

    Two numerically-matching bodies: channels-first (TPU default — see
    _temporal_loss_cfirst) and the NHWC form below (CPU/GPU, and the
    parity reference for tests).
    """
    use_cf = _USE_CFIRST
    if use_cf is None:
        use_cf = jax.default_backend() == "tpu"
    if use_cf:
        return _temporal_loss_cfirst(
            disps, target, sources, t_mats, k, k_inv,
            min_depth, max_depth, smoothness_weight,
        )

    from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth
    from scenedepthestimation_tpu.ops.project import reproject_sample
    from scenedepthestimation_tpu.ops.upsample import upsample2x

    # Identity errors (computed once — scale-independent): the automask
    # term. Tiny epsilon breaks ties in favour of reprojection (the
    # lineage adds randn*1e-5; a constant keeps the loss deterministic).
    identity_errs = [
        photometric_error(src, target) + 1e-5 for src in sources
    ]

    total = 0.0
    for s, disp in sorted(disps.items()):
        d = disp.astype(jnp.float32)
        for _ in range(s):
            d = upsample2x(d, mode="bilinear")
        _, depth = disp_to_depth(d[..., 0], min_depth, max_depth)

        # Each reprojection's residuals (4 bilinear corners + SSIM
        # windows, all C=3-minor arrays that XLA lane-pads ~21x) are
        # rematerialized in the backward instead of kept live; only the
        # (B, H-2, W-2) error maps stay live for the min-stack. This
        # NHWC body is the CPU/GPU + parity-reference form — on TPU the
        # dispatch above picks _temporal_loss_cfirst (b8 192x640 fp32
        # full-step: 622 ms NHWC+ckpt vs 491 ms cfirst, real harness).
        def reproj_err(depth_, src, t_mat):
            recon, _ = reproject_sample(
                jax.lax.stop_gradient(src), depth_, k, k_inv, t_mat
            )
            return photometric_error(recon, target)

        reproj_err = jax.checkpoint(reproj_err, static_argnums=())
        reproj_errs = [
            reproj_err(depth, src, t_mat)
            for src, t_mat in zip(sources, t_mats)
        ]
        all_errs = jnp.stack(reproj_errs + identity_errs, axis=0)
        min_err = jnp.min(all_errs, axis=0)  # (B, H-2, W-2)

        smooth = edge_aware_smoothness(d, target)
        total = total + jnp.mean(min_err) + smoothness_weight * smooth / (2.0**s)
    return total / len(disps)


def stereo_selfsup_loss(
    pred_disp: jnp.ndarray,
    left: jnp.ndarray,
    right: jnp.ndarray,
    smoothness_weight: float = 1e-3,
    alpha: float = 0.85,
) -> jnp.ndarray:
    """Self-supervised photometric stereo loss (SURVEY C14, monodepth
    stereo mode — no pose net needed, the rig baseline IS the pose).

    Reconstruct the left view by warping the right view with the
    predicted disparity; penalize SSIM+L1 photometric error (masked to
    in-frame samples) plus edge-aware smoothness.
    """
    from scenedepthestimation_tpu.ops.warp import (
        valid_mask_horizontal,
        warp_horizontal,
    )

    w = left.shape[2]
    # The warped source is DATA — stop its gradient so the warp's
    # backward skips the image-cotangent matmul (one-hot path) /
    # scatter (gather path); d(loss)/d(disp) is unchanged.
    recon = warp_horizontal(jax.lax.stop_gradient(right), pred_disp)
    err = photometric_error(recon, left, alpha=alpha)  # (B, H-2, W-2)
    valid = valid_mask_horizontal(pred_disp, w)[:, 1:-1, 1:-1]
    photo = jnp.sum(jnp.where(valid, err, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1.0
    )
    smooth = edge_aware_smoothness(pred_disp[..., None] / w, left)
    return photo + smoothness_weight * smooth
