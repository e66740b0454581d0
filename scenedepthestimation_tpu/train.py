"""Training loop (SURVEY C18): optax Adam + LR schedule, jit train steps.

TPU-native shape: the train step is ONE jit-compiled SPMD program —
preprocess, forward, loss, backward, and the Adam update all on device.
Data parallelism is the sharding of the batch axis: with params
replicated and the batch sharded over the mesh, GSPMD turns the loss mean
into gradient all-reduces (psum over ICI) automatically — no explicit
collective calls anywhere (SURVEY §2 parallelism table, §5.8).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from scenedepthestimation_tpu import losses
from scenedepthestimation_tpu.configs import RunConfig
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.models.stereo import StereoNet
from scenedepthestimation_tpu.ops.preprocess import preprocess


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def make_lr_schedule(
    learning_rate: float = 1e-4,
    scheduler: str = "step",
    decay_steps: int = 15_000,
    decay_rate: float = 0.1,
    warmup_steps: int = 0,
):
    """LR schedule: reference-family step decay (monodepth2 drops LR 10x
    after ~3/4 of training; UNVERIFIED vs reference), optionally preceded
    by a linear warmup. Warmup is a plain hyperparameter here, NOT a
    collapse mitigation: the round-3 collapse study (BASELINE.md)
    reproduced the high-LR soft-argmin collapse and measured warmup
    failing to rescue it in both collapsing configs (it even
    co-occurred with collapse at an otherwise-converging seed). The
    proven structural rescues are ``stereo.refine`` and
    ``stereo.aux_ce_weight``."""
    if scheduler == "step":
        base = optax.exponential_decay(
            learning_rate,
            transition_steps=decay_steps,
            decay_rate=decay_rate,
            staircase=True,
        )
    elif scheduler == "constant":
        base = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"unknown scheduler {scheduler!r}")
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        return optax.join_schedules([warmup, base], [warmup_steps])
    return base


def make_optimizer(
    learning_rate: float = 1e-4,
    scheduler: str = "step",
    decay_steps: int = 15_000,
    decay_rate: float = 0.1,
    warmup_steps: int = 0,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Adam over :func:`make_lr_schedule`.

    ``accum_steps > 1`` wraps the optimizer in gradient accumulation
    (optax.MultiSteps): every step's gradients are averaged and the
    parameter update applies once per ``accum_steps`` micro-batches —
    the standard way to train an effective batch that does not fit
    per-chip HBM (e.g. config-5's 384x1152 shapes at large effective
    batch). The wrapping composes with every step factory unchanged:
    the accumulation buffer lives in ``opt_state`` and the whole thing
    stays one jitted SPMD program per micro-step. BN running stats
    update every micro-step (the family's DataParallel semantics)."""
    tx = optax.adam(
        make_lr_schedule(
            learning_rate, scheduler, decay_steps, decay_rate, warmup_steps
        )
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def make_train_state(
    cfg: RunConfig,
    seed: int = 0,
    learning_rate: float = 1e-4,
    warmup_steps: int = 0,
    accum_steps: int = 1,
    scheduler: str = "step",
    decay_steps: int = 15_000,
    decay_rate: float = 0.1,
) -> TrainState:
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    rng = jax.random.PRNGKey(seed)
    if cfg.pipeline == "mono":
        model = MonoDepthNet(cfg=cfg.mono, dtype=dtype)
        dummy = (jnp.zeros((1, cfg.mono.height, cfg.mono.width, 3), dtype),)
    else:
        model = StereoNet(cfg=cfg.stereo, dtype=dtype)
        z = jnp.zeros((1, cfg.stereo.height, cfg.stereo.width, 3), dtype)
        dummy = (z, z)
    variables = model.init(rng, *dummy)
    tx = make_optimizer(
        learning_rate,
        scheduler=scheduler,
        decay_steps=decay_steps,
        decay_rate=decay_rate,
        warmup_steps=warmup_steps,
        accum_steps=accum_steps,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )


def make_mono_train_step(cfg: RunConfig, augment: bool = False):
    """Supervised monocular step: batch = {'image' uint8 BHW3,
    'gt_disp' float BHW1 in sigmoid units (0 = invalid)}.

    ``augment=True`` applies on-device random flip + color jitter
    (ops/augment, SURVEY C2); the batch must then carry an 'rng' key.
    """
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    net_hw = (cfg.mono.height, cfg.mono.width)

    def loss_fn(params, batch_stats, batch):
        if augment:
            from scenedepthestimation_tpu.ops.augment import augment_mono
            from scenedepthestimation_tpu.ops.preprocess import to_float

            aug = augment_mono(
                batch["rng"],
                {"image": to_float(batch["image"]), "gt_disp": batch["gt_disp"]},
            )
            batch = {**batch, **aug}
        x = preprocess(batch["image"], net_hw, cfg.pre, compute_dtype=dtype)
        variables = {"params": params, "batch_stats": batch_stats}
        disps, mutated = _apply_train(variables, x)
        disps = {s: d.astype(jnp.float32) for s, d in disps.items()}
        # Edge-aware smoothness sees [0,1] color like every other loss
        # path — the mean/std-normalized tensor has ~4.4x larger
        # gradients, which would collapse exp(-|∇I|) and silently
        # disable the prior.
        img01 = _to01_at(batch["image"], net_hw)
        loss = losses.mono_supervised_loss(disps, batch["gt_disp"], img01)
        return loss, mutated

    def _apply_train(variables, x):
        return _apply_mono_train(
            variables["params"], variables["batch_stats"], x, cfg, dtype
        )

    # All five step factories donate the TrainState: params + Adam
    # moments update in place instead of being copied every step
    # (~3x param bytes of HBM traffic at zero cost — every call site
    # rebinds ``state = step_fn(state, batch)``). CPU tests are
    # unaffected (donation is a no-op there).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        state = state.apply_gradients(grads, new_stats)
        return state, {"loss": loss}

    return train_step


def _apply_mono_train(params, batch_stats, x, cfg: RunConfig, dtype):
    """Mono train forward → (disps dict, new batch_stats).

    With ``cfg.mono.collapsed_train`` (and shapes the collapse admits —
    H, W multiples of 4) the decoder runs in the collapsed/packed layout
    (ops/collapsed.collapsed_mono_decoder_multiscale): an exact rewrite,
    so gradients match the standard path to reassociation error while
    the forward+backward skip the full-res C=16/32 materializations.
    """
    if (
        cfg.mono.collapsed_train
        and cfg.mono.upsample_mode == "nearest"
        and cfg.mono.height % 4 == 0
        and cfg.mono.width % 4 == 0
    ):
        from scenedepthestimation_tpu.models.resnet import ResNetEncoder
        from scenedepthestimation_tpu.ops.collapsed import (
            collapsed_mono_decoder_multiscale,
        )

        enc = ResNetEncoder(num_layers=cfg.mono.num_layers, dtype=dtype)
        feats, mut = enc.apply(
            {"params": params["encoder"], "batch_stats": batch_stats["encoder"]},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        disps = collapsed_mono_decoder_multiscale(
            params["decoder"],
            feats,
            dec_channels=cfg.mono.dec_channels,
            upsample_mode=cfg.mono.upsample_mode,
            dtype=dtype,
            scales=cfg.mono.scales,
        )
        return disps, {"encoder": mut["batch_stats"]}
    model = MonoDepthNet(cfg=cfg.mono, dtype=dtype)
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        train=True,
        mutable=["batch_stats"],
    )
    return out, mutated["batch_stats"]


def _to01_at(img, net_hw):
    """uint8/float frames → float32 [0,1] at the network resolution."""
    from scenedepthestimation_tpu.ops.preprocess import resize_bilinear, to_float

    x = to_float(img)
    if x.shape[-3:-1] != tuple(net_hw):
        x = resize_bilinear(x, net_hw)
    return x


def _augment_stereo_batch(batch, net_hw, crop):
    """Shared augmentation front-end for the stereo steps (SURVEY C2;
    VERDICT r2 next-#5): on-device pair-consistent flip(+view-swap where
    label-preserving) / crop-to-net-res / shared color jitter. The batch
    must carry an 'rng' key. Returns the batch with 'left'/'right'
    replaced by augmented float [0,1] views (+ '*_clean' photometric
    targets and geometrically-consistent GT)."""
    from scenedepthestimation_tpu.ops.augment import augment_stereo
    from scenedepthestimation_tpu.ops.preprocess import to_float

    aug_in = {"left": to_float(batch["left"]), "right": to_float(batch["right"])}
    for k in ("gt_disp", "valid", "gt_disp_right", "valid_right"):
        if k in batch:
            aug_in[k] = batch[k]
    aug = augment_stereo(
        batch["rng"], aug_in, crop_hw=tuple(net_hw) if crop else None
    )
    return {**batch, **aug}


def _stereo_collapsed_train(cfg: RunConfig) -> bool:
    """Gate for running the packed/collapsed stereo forward inside the
    train steps (StereoConfig.collapsed_train): shapes must admit the
    collapse, and refine must be off — its intermediate-scale aux cost
    heads read the module decoder's internals."""
    from scenedepthestimation_tpu.api import stereo_packed_supported

    return (
        cfg.stereo.collapsed_train
        and stereo_packed_supported(cfg.stereo)
        and not cfg.stereo.refine
    )


def _stereo_packed_apply(params, xl, xr, scfg, dtype, return_cost=False):
    """Interleave + packed forward (exact rewrite, differentiable) —
    the train-side entry to api.stereo_packed_pair_forward."""
    from scenedepthestimation_tpu.api import stereo_packed_pair_forward

    b, h, w, c = xl.shape
    pair = jnp.stack([xl, xr], axis=1).reshape(2 * b, h, w, c)
    return stereo_packed_pair_forward(
        params, pair, scfg, dtype, return_cost=return_cost
    )


def make_stereo_train_step(cfg: RunConfig, augment: bool = False, crop: bool = False):
    """Supervised stereo step: batch = {'left','right' uint8 BHW3,
    'gt_disp' float BHW px, 'valid' bool BHW}.

    With ``cfg.stereo.refine`` the loss additionally supervises the
    pre-refinement and intermediate-scale readouts (weights 1/2^k,
    DispNetC-lineage multi-scale supervision — VERDICT r1 next-#3).

    ``augment=True`` applies :func:`ops.augment.augment_stereo` on
    device (batch must carry 'rng'); ``crop=True`` additionally crops
    larger-than-net-res batches to net resolution with a shared random
    offset (exact for disparity, unlike the resize fallback). With
    left-only GT the flip stays off (see augment_stereo docstring)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    net_hw = (cfg.stereo.height, cfg.stereo.width)

    ce_w = cfg.stereo.aux_ce_weight
    use_collapsed = _stereo_collapsed_train(cfg)

    def loss_fn(params, batch):
        if augment:
            batch = _augment_stereo_batch(batch, net_hw, crop)
        xl = preprocess(batch["left"], net_hw, cfg.pre, compute_dtype=dtype)
        xr = preprocess(batch["right"], net_hw, cfg.pre, compute_dtype=dtype)
        if use_collapsed:
            out = _stereo_packed_apply(
                params, xl, xr, cfg.stereo, dtype, return_cost=ce_w > 0
            )
        else:
            model = StereoNet(cfg=cfg.stereo, dtype=dtype)
            out = model.apply(
                {"params": params},
                xl,
                xr,
                return_aux=cfg.stereo.refine,
                return_cost=ce_w > 0,
            )
        out = out if isinstance(out, tuple) else (out,)
        disp, rest = out[0], list(out[1:])
        cost = rest.pop() if ce_w > 0 else None
        aux = rest.pop() if cfg.stereo.refine else []
        total = losses.stereo_supervised_loss(
            disp.astype(jnp.float32), batch["gt_disp"], batch["valid"]
        )
        for k, a in enumerate(aux):
            total = total + losses.stereo_supervised_loss(
                a.astype(jnp.float32), batch["gt_disp"], batch["valid"]
            ) / (2.0 ** (k + 1))
        if ce_w > 0:
            # Structural anchor against the soft-argmin collapse
            # (BASELINE.md round-3 rescue table).
            total = total + ce_w * losses.disparity_classification_loss(
                cost,
                batch["gt_disp"],
                batch["valid"],
                stride=cfg.stereo.feat_stride,
                temperature=cfg.stereo.softargmin_temperature,
            )
        return total

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        state = state.apply_gradients(grads, state.batch_stats)
        return state, {"loss": loss}

    return train_step


def make_stereo_selfsup_train_step(
    cfg: RunConfig, augment: bool = False, crop: bool = False
):
    """Self-supervised stereo step (no GT): batch = {'left','right'}.

    ``augment``/``crop`` as in :func:`make_stereo_train_step`; with no GT
    the pair-consistent hflip-with-view-swap is active, and the
    photometric targets are the '*_clean' (pre-jitter) views so the
    reconstruction objective stays un-corrupted."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    net_hw = (cfg.stereo.height, cfg.stereo.width)
    use_collapsed = _stereo_collapsed_train(cfg)

    def loss_fn(params, batch):
        if augment:
            batch = _augment_stereo_batch(batch, net_hw, crop)
        xl = preprocess(batch["left"], net_hw, cfg.pre, compute_dtype=dtype)
        xr = preprocess(batch["right"], net_hw, cfg.pre, compute_dtype=dtype)
        if use_collapsed:
            disp = _stereo_packed_apply(params, xl, xr, cfg.stereo, dtype)
            disp = disp.astype(jnp.float32)
        else:
            model = StereoNet(cfg=cfg.stereo, dtype=dtype)
            disp = model.apply({"params": params}, xl, xr).astype(jnp.float32)
        # Photometric target in [0,1] intensity space (pre-jitter views
        # when augmenting).
        l01 = _to01_at(batch.get("left_clean", batch["left"]), net_hw)
        r01 = _to01_at(batch.get("right_clean", batch["right"]), net_hw)
        return losses.stereo_selfsup_loss(disp, l01, r01)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        state = state.apply_gradients(grads, state.batch_stats)
        return state, {"loss": loss}

    return train_step


def make_mono_selfsup_train_step(cfg: RunConfig, augment: bool = False):
    """Self-supervised MONOCULAR training from stereo pairs (the
    monodepth/monodepth2 'stereo mode', SURVEY C14): the mono net sees
    only the left image; its disparity warps the right view into a left
    reconstruction; the rig baseline is the known 'pose', so no pose
    network is required. Multi-scale: every scale is upsampled to full
    resolution before the photometric term (monodepth2 protocol).

    ``augment=True`` (batch must carry 'rng') applies the
    pair-consistent stereo augmentation (flip-with-view-swap + shared
    color jitter, ops/augment.augment_stereo; VERDICT r4 missing-#3):
    the net input is the jittered left view, the photometric targets
    are the clean post-flip views."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    net_hw = (cfg.mono.height, cfg.mono.width)
    fx_b = cfg.stereo.focal_px * cfg.stereo.baseline_m

    def loss_fn(params, batch_stats, batch):
        from scenedepthestimation_tpu.ops.disp_to_depth import disp_to_depth
        from scenedepthestimation_tpu.ops.upsample import upsample2x

        if augment:
            batch = _augment_stereo_batch(batch, net_hw, crop=False)
        xl = preprocess(batch["left"], net_hw, cfg.pre, compute_dtype=dtype)
        disps, new_stats = _apply_mono_train(params, batch_stats, xl, cfg, dtype)
        # Photometric targets at network resolution in [0,1] (the sibling
        # stereo-selfsup path handles full-res inputs the same way);
        # clean post-flip views when augmenting.
        l01 = _to01_at(batch.get("left_clean", batch["left"]), net_hw)
        r01 = _to01_at(batch.get("right_clean", batch["right"]), net_hw)

        total = 0.0
        for s, d in sorted(disps.items()):
            d = d.astype(jnp.float32)
            for _ in range(s):
                d = upsample2x(d, mode="bilinear")
            _, depth = disp_to_depth(
                d[..., 0], cfg.mono.min_depth, cfg.mono.max_depth
            )
            disp_px = fx_b / depth  # rectified-rig reprojection
            total = total + losses.stereo_selfsup_loss(
                disp_px, l01, r01, smoothness_weight=1e-3 / (2.0**s)
            )
        return total / len(disps), new_stats

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        state = state.apply_gradients(grads, new_stats)
        return state, {"loss": loss}

    return train_step


def make_temporal_train_state(
    cfg: RunConfig,
    seed: int = 0,
    learning_rate: float = 1e-4,
    warmup_steps: int = 0,
    accum_steps: int = 1,
    scheduler: str = "step",
    decay_steps: int = 15_000,
    decay_rate: float = 0.1,
) -> TrainState:
    """Joint depth+pose state for temporal self-supervision (SURVEY
    §3.5 / C14): params = {'depth': ..., 'pose': ...}."""
    from scenedepthestimation_tpu.models.posenet import PoseNet

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    h, w = cfg.mono.height, cfg.mono.width
    depth_model = MonoDepthNet(cfg=cfg.mono, dtype=dtype)
    pose_model = PoseNet(dtype=dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    dvars = depth_model.init(k1, jnp.zeros((1, h, w, 3), dtype))
    pvars = pose_model.init(k2, jnp.zeros((1, h, w, 6), dtype))
    params = {"depth": dvars["params"], "pose": pvars["params"]}
    batch_stats = {
        "depth": dvars.get("batch_stats", {}),
        "pose": pvars.get("batch_stats", {}),
    }
    tx = make_optimizer(
        learning_rate,
        scheduler=scheduler,
        decay_steps=decay_steps,
        decay_rate=decay_rate,
        warmup_steps=warmup_steps,
        accum_steps=accum_steps,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=depth_model.apply,
    )


def make_mono_temporal_train_step(cfg: RunConfig, augment: bool = False):
    """Temporal self-supervised monocular step (monodepth2 protocol):
    batch = {'frames' uint8 (B, 3, H, W, 3) ordered [prev, target, next],
    'K' (B, 3, 3) pixel intrinsics at network resolution}.

    One SPMD program: preprocess all frames, PoseNet on (prev,target) and
    (target,next), depth on the target, min-reprojection + automask loss,
    backward, Adam — poses and depth trained jointly.

    ``augment=True`` (batch must carry 'rng') applies on-device
    triplet-consistent flip (principal point mirrored in K) + shared
    color jitter (ops/augment.augment_temporal; VERDICT r4 missing-#3).
    The jittered frames feed BOTH networks; the photometric targets
    stay clean — the monodepth2 color/color_aug split.
    """
    from scenedepthestimation_tpu.models.posenet import PoseNet
    from scenedepthestimation_tpu.ops.project import pose_vec_to_mat

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    net_hw = (cfg.mono.height, cfg.mono.width)
    pose_model = PoseNet(dtype=dtype)

    def loss_fn(params, batch_stats, batch):
        # [0,1] photometric frames at network resolution (K must be
        # expressed at this resolution — the batcher guarantees it).
        frames01 = _to01_at(batch["frames"], net_hw)
        k_in = batch["K"].astype(jnp.float32)
        if augment:
            from scenedepthestimation_tpu.ops.augment import augment_temporal

            clean, aug, k_in = augment_temporal(batch["rng"], frames01, k_in)
        else:
            clean = aug = frames01
        prev, target, nxt = clean[:, 0], clean[:, 1], clean[:, 2]
        prev_in, target_in, next_in = aug[:, 0], aug[:, 1], aug[:, 2]
        x = preprocess(target_in, net_hw, cfg.pre, compute_dtype=dtype)

        disps, depth_stats = _apply_mono_train(
            params["depth"], batch_stats["depth"], x, cfg, dtype
        )
        disps = {s: d for s, d in disps.items()}

        pose_stats = batch_stats["pose"]

        def pose_for(a, b, invert, stats):
            # PoseNet sees the SAME mean/std normalization as the depth
            # encoder (the lineage convention; raw [0,1] input would make
            # reference pose-encoder weight import produce wrong
            # activations and diverge the two encoders' input stats).
            from scenedepthestimation_tpu.ops.preprocess import normalize

            pair = jnp.concatenate(
                [
                    normalize(a, cfg.pre.mean, cfg.pre.std).astype(dtype),
                    normalize(b, cfg.pre.mean, cfg.pre.std).astype(dtype),
                ],
                axis=-1,
            )
            (aa, tt), mut = pose_model.apply(
                {"params": params["pose"], "batch_stats": stats},
                pair,
                train=True,
                mutable=["batch_stats"],
            )
            return pose_vec_to_mat(aa, tt, invert=invert), mut["batch_stats"]

        # monodepth2 convention: pose input is temporally ordered, the
        # transform for the earlier frame is inverted. PoseNet sees the
        # jittered (network-input) frames, like the depth encoder.
        t_prev, pose_stats = pose_for(prev_in, target_in, True, pose_stats)
        t_next, pose_stats = pose_for(target_in, next_in, False, pose_stats)

        k = k_in
        k_inv = jnp.linalg.inv(k)
        loss = losses.mono_temporal_selfsup_loss(
            disps,
            target,
            [prev, nxt],
            [t_prev, t_next],
            k,
            k_inv,
            cfg.mono.min_depth,
            cfg.mono.max_depth,
            at_scale=cfg.mono.temporal_at_scale,
        )
        return loss, {"depth": depth_stats, "pose": pose_stats}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        state = state.apply_gradients(grads, new_stats)
        return state, {"loss": loss}

    return train_step


def _full_state_tree(state: TrainState):
    """The persisted slice of a TrainState: everything a resume needs
    (params, BN stats, Adam moments + schedule counter, global step).
    tx/apply_fn are code, reconstructed from the config at restore."""
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_train_state(state: TrainState, path: str) -> None:
    """Persist the FULL TrainState with Orbax (VERDICT r3 missing-#3:
    a resume without the Adam moments and step restarts the optimizer
    cold and the LR schedule at 0). Overwrites ``path`` if present
    (resumed runs re-save ``final``).

    Also drops a ``TRAIN_STATE.json`` sidecar inside the checkpoint dir
    carrying the global step, so :func:`find_train_state` can order
    snapshots by TRAINING PROGRESS rather than filesystem mtime (a
    ``cp -r``'d checkpoint tree must not change which snapshot resumes
    — VERDICT r4 weak-#4). Orbax restore ignores the extra file."""
    import json
    import os

    from scenedepthestimation_tpu.utils import checkpoint

    checkpoint.save_pytree(path, _full_state_tree(state), force=True)
    with open(os.path.join(path, "TRAIN_STATE.json"), "w") as f:
        json.dump({"step": int(state.step)}, f)


def restore_train_state(path: str, template: TrainState) -> TrainState:
    """Restore a :func:`save_train_state` snapshot into ``template`` —
    a freshly-built state from the SAME config/optimizer settings
    (make_train_state / make_temporal_train_state), whose optax
    container types and leaf dtypes the restore preserves."""
    from scenedepthestimation_tpu.utils import checkpoint

    restored = checkpoint.restore_pytree(path, _full_state_tree(template))
    return template.replace(**restored)


def _snapshot_step(path: str) -> int:
    """Global step embedded in a full-state snapshot: the
    ``TRAIN_STATE.json`` sidecar (authoritative), else the ``step_N``
    dirname convention, else -1 (unknown — pre-sidecar checkpoint)."""
    import json
    import os
    import re

    try:
        with open(os.path.join(path, "TRAIN_STATE.json")) as f:
            return int(json.load(f)["step"])
    except (OSError, ValueError, KeyError, TypeError):
        # Missing or malformed sidecar (e.g. {"step": null}): fall back
        # to the dirname convention rather than crashing --resume.
        pass
    m = re.search(r"step_(\d+)_train$", os.path.basename(path))
    return int(m.group(1)) if m else -1


def _is_full_train_state(path: str) -> bool:
    """True when the Orbax checkpoint at ``path`` persists an
    ``opt_state`` top-level entry (read from the ``_METADATA`` tree
    index) — i.e. it is a :func:`save_train_state` snapshot, not a
    predict artifact like ``{save}/final`` (ADVICE r4: resuming a
    predict artifact fails deep inside orbax with an opaque
    structure-mismatch otherwise)."""
    import json
    import os

    if os.path.exists(os.path.join(path, "TRAIN_STATE.json")):
        return True
    meta = os.path.join(path, "_METADATA")
    try:
        with open(meta) as f:
            tree = json.load(f)["tree_metadata"]
        return any(
            v.get("key_metadata", [{}])[0].get("key") == "opt_state"
            for v in tree.values()
        )
    except Exception:
        # Unreadable metadata OR an orbax-version/shape surprise in the
        # probe itself (empty key_metadata, non-dict entries, ...):
        # accept and let the restore decide — the probe exists to give a
        # better error, never to produce a worse one.
        return True


def find_train_state(path: str) -> str:
    """Resolve a ``--resume`` argument: either a full-state checkpoint
    directory itself, or a save dir containing ``*_train`` snapshots
    (``step_N_train``, ``final_train``, ``interrupt_train``) — picks
    the one with the HIGHEST embedded global step (mtime only breaks
    ties), so a SIGTERM'd run resumes from its interrupt snapshot, a
    completed one from ``final_train``, and a ``cp -r``'d tree resumes
    identically to the original."""
    import os

    if os.path.exists(
        os.path.join(path, "_CHECKPOINT_METADATA")
    ) or os.path.isdir(os.path.join(path, "params")):
        if not _is_full_train_state(path):
            raise FileNotFoundError(
                f"{path!r} is a predict/eval weights artifact, not a full "
                f"train state — pass a *_train snapshot (step_N_train / "
                f"final_train / interrupt_train) or the save dir itself"
            )
        return path
    if os.path.isdir(path):
        cands = [
            os.path.join(path, e)
            for e in os.listdir(path)
            if e.endswith("_train")
            and (
                e.startswith("step_") or e in ("final_train", "interrupt_train")
            )
            and os.path.isdir(os.path.join(path, e))
        ]
        if cands:
            steps = {p: _snapshot_step(p) for p in cands}
            if all(s >= 0 for s in steps.values()):
                return max(
                    cands,
                    key=lambda p: (steps[p], os.path.getmtime(p), p),
                )
            # Back-compat: a pre-sidecar tree has final_train /
            # interrupt_train snapshots with UNKNOWN step — ranking
            # them -1 would silently resume an older step_N_train and
            # discard progress, so such trees keep the legacy
            # newest-mtime rule (step ordering engages only when every
            # candidate's step is known).
            return max(cands, key=lambda p: (os.path.getmtime(p), p))
    raise FileNotFoundError(
        f"no full train state under {path!r} (expected a checkpoint dir, "
        f"or a save dir with step_*_train / final_train / interrupt_train)"
    )


def save_predict_artifact(state: TrainState, path: str) -> None:
    """Save the predict/eval-compatible variables checkpoint (what
    ``--weights`` consumes). Joint depth+pose states (temporal mode)
    nest params as {'depth','pose'} — a layout the inference Predictor
    cannot read — so the depth sub-tree lands at ``path`` and the pose
    network at ``path_pose``."""
    from scenedepthestimation_tpu.utils import checkpoint

    params, stats = state.params, state.batch_stats
    if isinstance(params, dict) and set(params) == {"depth", "pose"}:
        pose_vars = {"params": params["pose"]}
        if stats and stats.get("pose"):
            pose_vars["batch_stats"] = stats["pose"]
        checkpoint.save_pytree(path + "_pose", pose_vars, force=True)
        params = params["depth"]
        stats = stats.get("depth", {}) if stats else {}
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    checkpoint.save_pytree(path, variables, force=True)


def save_checkpoint(state: TrainState, path: str) -> None:
    """One save = TWO artifacts: the predict artifact at ``path``
    (:func:`save_predict_artifact`) and the full TrainState at
    ``path + '_train'`` for ``--resume``."""
    save_predict_artifact(state, path)
    save_train_state(state, path + "_train")


@dataclasses.dataclass
class Trainer:
    """THE training loop (SURVEY C18/§3.5) — logging, periodic saves,
    periodic validation, resume-aware global-step accounting. The CLI's
    ``scenedepth train`` drives this same loop (VERDICT r3 weak-#4:
    two diverging copies unified in round 4)."""

    cfg: RunConfig
    learning_rate: float = 1e-4
    log_every: int = 50
    save_every: int = 1000
    save_path: Optional[str] = None
    # Periodic validation (VERDICT r3 missing-#4): every ``val_every``
    # steps ``val_fn(state)`` returns a metrics dict, logged as one
    # JSON line {"val_step": N, ...}. 0 = off.
    val_every: int = 0
    val_fn: Optional[Callable] = None
    # Also append every train/val JSON line to this file (long-run
    # observability; stdout is unchanged).
    log_file: Optional[str] = None
    # Save a resumable full-state checkpoint at {save_path}/interrupt
    # on SIGTERM/SIGINT and stop cleanly (SURVEY §5.3/5.4 failure
    # recovery: a preempted run loses at most the in-flight step).
    # Requires save_path; engaged by fit() only in the main thread.
    save_on_interrupt: bool = False
    # Set by fit(): True when the run stopped on a signal rather than
    # completing — callers must NOT write 'final' artifacts then (a
    # partial run masquerading as a finished one shadows the interrupt
    # snapshot; ADVICE r4).
    interrupted: bool = dataclasses.field(default=False, init=False)

    def fit(
        self,
        batches: Iterable,
        num_steps: int,
        seed: int = 0,
        state: Optional[TrainState] = None,
        step_fn: Optional[Callable] = None,
    ) -> TrainState:
        """Run until ``num_steps`` TOTAL steps (a resumed state's
        restored step counts — passing the same --steps after a crash
        finishes the run rather than doubling it). By default builds
        the supervised step for the config's pipeline; pass ``step_fn``
        (any make_*_train_step product) and/or a resumed ``state`` to
        train other modes."""
        import json

        if state is None:
            state = make_train_state(
                self.cfg, seed=seed, learning_rate=self.learning_rate
            )
        if step_fn is None:
            step_fn = (
                make_mono_train_step(self.cfg)
                if self.cfg.pipeline == "mono"
                else make_stereo_train_step(self.cfg)
            )
        logf = open(self.log_file, "a") if self.log_file else None

        def emit(obj):
            line = json.dumps(obj)
            print(line, flush=True)
            if logf is not None:
                logf.write(line + "\n")
                logf.flush()

        # Cooperative interrupt: the FIRST signal only sets a flag — the
        # loop finishes the in-flight step, saves a resumable snapshot,
        # and returns. A SECOND signal restores the previous handlers
        # and raises KeyboardInterrupt so a hung step/compile (100+ s
        # compiles happen) can still be force-exited with Ctrl-C
        # (ADVICE r4: swallowing every signal needs SIGKILL otherwise).
        # Installed in the main thread only (signal module restriction);
        # the previous handlers are restored on exit.
        self.interrupted = False
        stop = {"flag": False}
        prev_handlers = {}
        if self.save_on_interrupt and self.save_path:
            import signal
            import threading

            if threading.current_thread() is threading.main_thread():
                def _on_signal(signum, frame):
                    if stop["flag"]:
                        for sig, h in prev_handlers.items():
                            signal.signal(sig, h)
                        raise KeyboardInterrupt
                    stop["flag"] = True

                for sig in (signal.SIGTERM, signal.SIGINT):
                    prev_handlers[sig] = signal.signal(sig, _on_signal)

        # One host sync at entry; per-step counting stays host-side
        # (int(state.step) every step would add a blocking dispatch —
        # ~28 ms on the dev tunnel, measurement-lessons).
        step = int(state.step)
        t0 = time.time()
        done0 = step
        try:
            for batch in batches:
                if step >= num_steps:
                    break
                if stop["flag"]:
                    path = f"{self.save_path}/interrupt"
                    self.save(state, path)
                    emit({"interrupted_at": step, "saved": path})
                    self.interrupted = True
                    break
                state, metrics = step_fn(state, batch)
                step += 1
                if step % self.log_every == 0:
                    emit(
                        {
                            "step": step,
                            "loss": round(float(metrics["loss"]), 6),
                            "sec_per_step": round(
                                (time.time() - t0) / max(step - done0, 1), 3
                            ),
                        }
                    )
                if (
                    self.val_every
                    and self.val_fn
                    and step % self.val_every == 0
                ):
                    # A validation failure (bad split file, eval-side
                    # bug) must not kill a long training run — it
                    # surfaces as a logged error line instead
                    # (VERDICT r4 weak-#4).
                    try:
                        emit({"val_step": step, **self.val_fn(state)})
                    except Exception as e:  # noqa: BLE001
                        emit({"val_step": step, "val_error": str(e)})
                if self.save_path and step % self.save_every == 0:
                    self.save(state, f"{self.save_path}/step_{step:07d}")
        finally:
            if logf is not None:
                logf.close()
            if prev_handlers:
                import signal

                for sig, h in prev_handlers.items():
                    signal.signal(sig, h)
        return state

    def save(self, state: TrainState, path: str) -> None:
        save_checkpoint(state, path)
