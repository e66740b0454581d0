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


def _downsample_image_cf(img_cf: jnp.ndarray) -> jnp.ndarray:
    """One 2x area downsample on (B, C, H, W) (strided slices + add —
    same layout rationale as _avg_pool3_cf; exact same math as one
    _downsample_image step)."""
    h, w = img_cf.shape[2] // 2 * 2, img_cf.shape[3] // 2 * 2
    x = img_cf[:, :, :h, :w]
    return (
        x[:, :, 0::2, 0::2] + x[:, :, 0::2, 1::2]
        + x[:, :, 1::2, 0::2] + x[:, :, 1::2, 1::2]
    ) * 0.25


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
    at_scale: bool = False,
) -> jnp.ndarray:
    """Channels-first body of mono_temporal_selfsup_loss. Differences
    from the NHWC body are layout-only: corner tables hoisted out of
    the scale loop (depth-independent), W-minor point math/lerps/SSIM,
    and NO jax.checkpoint — the residuals that OOM'd in NHWC (42x
    lane-padded corner/SSIM intermediates) are compact here, so the
    backward reuses them instead of re-running the gathers.

    ``at_scale``: per-scale tables/identity errors are built from the
    2x-area-downsampled pyramid instead of one full-res set (the
    tables stay depth-independent, so still one build per resolution)."""
    from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth
    from scenedepthestimation_tpu.ops.project import (
        pack4_table,
        reproject_coords,
        sample_table_cfirst,
    )
    from scenedepthestimation_tpu.ops.upsample import upsample2x_rank3

    target_cf = target.transpose(0, 3, 1, 2)
    src_cf = [jax.lax.stop_gradient(s).transpose(0, 3, 1, 2) for s in sources]

    scale_set = sorted(disps) if at_scale else [0]
    tgt_pyr = {0: target_cf}
    src_pyr = {0: src_cf}
    for s in scale_set:
        if s not in tgt_pyr:
            prev = max(p for p in tgt_pyr if p < s)
            t_, ss_ = tgt_pyr[prev], src_pyr[prev]
            for _ in range(s - prev):
                t_ = _downsample_image_cf(t_)
                ss_ = [_downsample_image_cf(x) for x in ss_]
            tgt_pyr[s], src_pyr[s] = t_, ss_
    identity_errs = {
        s: [photometric_error_cf(x, tgt_pyr[s]) + 1e-5 for x in src_pyr[s]]
        for s in scale_set
    }
    # pack4_table wants NHWC input; transpose the (already downsampled)
    # channels-first pyramid back per resolution (cheap: one per frame
    # per resolution, outside the scale loop, depth-independent).
    tables = {
        s: [
            pack4_table(x.transpose(0, 2, 3, 1))
            for x in src_pyr[s]
        ]
        for s in scale_set
    }

    total = 0.0
    for s, disp in sorted(disps.items()):
        d = disp.astype(jnp.float32)[..., 0]  # (B, h_s, w_s)
        loss_s = s if at_scale else 0
        if not at_scale:
            for _ in range(s):
                d = upsample2x_rank3(d)
        _, depth = disp_to_depth(d, min_depth, max_depth)
        k_s, k_inv_s = _scale_k(k, k_inv, loss_s)
        tgt_s = tgt_pyr[loss_s]
        h_s, w_s = tgt_s.shape[2:]

        reproj_errs = []
        for table, t_mat in zip(tables[loss_s], t_mats):
            x, y = reproject_coords(depth, k_s, k_inv_s, t_mat)
            recon = sample_table_cfirst(table, x, y, h_s, w_s)
            reproj_errs.append(photometric_error_cf(recon, tgt_s))
        all_errs = jnp.stack(reproj_errs + identity_errs[loss_s], axis=0)
        min_err = jnp.min(all_errs, axis=0)  # (B, H_s-2, W_s-2)

        smooth = edge_aware_smoothness_cf(d, tgt_s)
        total = total + jnp.mean(min_err) + smoothness_weight * smooth / (2.0**s)
    return total / len(disps)


def _scale_k(k: jnp.ndarray, k_inv: jnp.ndarray, s: int):
    """Pinhole intrinsics for a 2^s-downsampled image (linear rescaling,
    the monodepth-family convention): rows 0,1 of K shrink by 2^s;
    equivalently columns 0,1 of K^-1 grow by 2^s (K_s^-1 = K^-1 S^-1)."""
    if s == 0:
        return k, k_inv
    f = 1.0 / (2.0**s)
    k_s = k.at[:, :2, :].multiply(f)
    k_inv_s = k_inv.at[:, :, :2].multiply(2.0**s)
    return k_s, k_inv_s


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
    at_scale: bool = False,
) -> jnp.ndarray:
    """monodepth2 temporal photometric loss (SURVEY C14): per scale,
    upsample disparity to full res, convert to depth, reproject every
    source frame into the target view, take the per-pixel MINIMUM
    photometric error over sources AND over identity reprojections
    (automasking of static pixels / moving objects), plus edge-aware
    smoothness decayed by scale.

    disps: {scale: (B, h_s, w_s, 1) sigmoid}; target (B, H, W, 3) [0,1];
    sources: list of (B, H, W, 3); t_mats: list of (B, 4, 4).

    ``at_scale=True`` switches the multi-scale protocol from
    monodepth2's upsample-to-full-res to the monodepth-v1 convention:
    each scale's reprojection runs at its NATIVE resolution against
    2x-area-downsampled frames with linearly rescaled intrinsics. The
    gather/SSIM cost of scales 1..3 drops 4x/16x/64x (sum 4 -> ~1.33
    full-res-equivalents); the measured fps and quality trade is in
    BASELINE.md (round 4). Default off — the full-res protocol is the
    reference-parity form.

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
            min_depth, max_depth, smoothness_weight, at_scale,
        )

    from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth
    from scenedepthestimation_tpu.ops.project import reproject_sample
    from scenedepthestimation_tpu.ops.upsample import upsample2x

    # Identity errors (computed once per resolution): the automask
    # term. Tiny epsilon breaks ties in favour of reprojection (the
    # lineage adds randn*1e-5; a constant keeps the loss deterministic).
    scale_set = sorted(disps) if at_scale else [0]
    tgt_pyr = {0: target}
    src_pyr = {0: list(sources)}
    for s in scale_set:
        if s not in tgt_pyr:
            prev = max(p for p in tgt_pyr if p < s)
            t_, ss_ = tgt_pyr[prev], src_pyr[prev]
            for _ in range(s - prev):
                t_ = _downsample_image(t_, 1)
                ss_ = [_downsample_image(x, 1) for x in ss_]
            tgt_pyr[s], src_pyr[s] = t_, ss_
    identity_errs = {
        s: [photometric_error(src, tgt_pyr[s]) + 1e-5 for src in src_pyr[s]]
        for s in scale_set
    }

    total = 0.0
    for s, disp in sorted(disps.items()):
        d = disp.astype(jnp.float32)
        loss_s = s if at_scale else 0
        if not at_scale:
            for _ in range(s):
                d = upsample2x(d, mode="bilinear")
        _, depth = disp_to_depth(d[..., 0], min_depth, max_depth)
        k_s, k_inv_s = _scale_k(k, k_inv, loss_s)
        tgt_s = tgt_pyr[loss_s]

        # Each reprojection's residuals (4 bilinear corners + SSIM
        # windows, all C=3-minor arrays that XLA lane-pads ~21x) are
        # rematerialized in the backward instead of kept live; only the
        # (B, H-2, W-2) error maps stay live for the min-stack. This
        # NHWC body is the CPU/GPU + parity-reference form — on TPU the
        # dispatch above picks _temporal_loss_cfirst (b8 192x640 fp32
        # full-step: 622 ms NHWC+ckpt vs 491 ms cfirst, real harness).
        def reproj_err(depth_, src, t_mat):
            recon, _ = reproject_sample(
                jax.lax.stop_gradient(src), depth_, k_s, k_inv_s, t_mat
            )
            return photometric_error(recon, tgt_s)

        reproj_err = jax.checkpoint(reproj_err, static_argnums=())
        reproj_errs = [
            reproj_err(depth, src, t_mat)
            for src, t_mat in zip(src_pyr[loss_s], t_mats)
        ]
        all_errs = jnp.stack(reproj_errs + identity_errs[loss_s], axis=0)
        min_err = jnp.min(all_errs, axis=0)  # (B, H_s-2, W_s-2)

        smooth = edge_aware_smoothness(d, tgt_s)
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
