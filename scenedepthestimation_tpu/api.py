"""Public inference API (SURVEY C19) — the preserved reference surface:
load weights; predict a depth map from a single image or a stereo pair
(BASELINE.json:5).

Design: a :class:`Predictor` owns the config, the Flax variables, and a
cache of jit-compiled end-to-end programs (one per input signature). Each
program is the WHOLE device pipeline — preprocess ∘ forward ∘ postprocess
(SURVEY §3.1/§3.2) — so the host only ever handles decoded uint8 frames
in and depth maps out.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scenedepthestimation_tpu import configs
from scenedepthestimation_tpu.configs import RunConfig
from scenedepthestimation_tpu.models.monodepth import MonoDepthNet
from scenedepthestimation_tpu.models.stereo import StereoNet
from scenedepthestimation_tpu.ops.disp_to_depth import (
    depth_from_disparity,
    disp_to_depth,
)
from scenedepthestimation_tpu.ops.preprocess import preprocess, resize_bilinear
from scenedepthestimation_tpu.utils import checkpoint


def _compute_dtype(cfg: RunConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def build_mono_program(
    cfg: RunConfig, model: MonoDepthNet, post_process: bool = False
):
    """Un-jitted end-to-end mono program (SURVEY §3.1): uint8 frames →
    {'disp', 'depth'} at source resolution. jit-wrapped by Predictor;
    also exported raw for the driver's compile check (__graft_entry__).

    ``post_process=True`` enables the monodepth-lineage flip-averaging
    TTA: the batch is doubled with mirrored frames and the two disparity
    maps are blended with the standard ramp mask (UNVERIFIED vs
    reference; standard family option).
    """
    net_hw = (cfg.mono.height, cfg.mono.width)
    dtype = _compute_dtype(cfg)
    # Packed finest-levels execution (ops/packed.py): exact rewrite, only
    # valid for nearest upsample + even feature grids + scale-0 output.
    use_packed = (
        cfg.mono.packed_decoder
        and cfg.mono.upsample_mode == "nearest"
        and cfg.mono.height % 4 == 0
        and cfg.mono.width % 4 == 0
        and 0 in cfg.mono.scales
    )

    use_folded = cfg.mono.fold_bn

    def _feats(variables, x):
        """Encoder feature pyramid, BN folded or live-stats."""
        if use_folded:
            from scenedepthestimation_tpu.models.folded import (
                fold_encoder_bn,
                folded_encoder_apply,
            )

            # Loop-invariant under jit (depends only on the weights); for
            # the per-call serving path it is param-sized — negligible.
            folded = fold_encoder_bn(
                variables["params"]["encoder"],
                variables["batch_stats"]["encoder"],
                cfg.mono.num_layers,
            )
            return folded_encoder_apply(
                folded,
                x,
                cfg.mono.num_layers,
                dtype=dtype,
                s2d_stem=cfg.mono.s2d_stem,
            )
        from scenedepthestimation_tpu.models.resnet import ResNetEncoder

        return ResNetEncoder(num_layers=cfg.mono.num_layers, dtype=dtype).apply(
            {
                "params": variables["params"]["encoder"],
                "batch_stats": variables["batch_stats"]["encoder"],
            },
            x,
        )

    def forward_disp0(variables, x):
        if not (use_packed or use_folded):
            return model.apply(variables, x)[0]
        feats = _feats(variables, x)
        if not use_packed:
            from scenedepthestimation_tpu.models.unet_decoder import DepthDecoder

            return DepthDecoder(
                dec_channels=cfg.mono.dec_channels,
                scales=cfg.mono.scales,
                upsample_mode=cfg.mono.upsample_mode,
                dtype=dtype,
            ).apply({"params": variables["params"]["decoder"]}, feats)[0]
        from scenedepthestimation_tpu.ops.collapsed import collapsed_mono_decoder

        return collapsed_mono_decoder(
            variables["params"]["decoder"],
            feats,
            dec_channels=cfg.mono.dec_channels,
            upsample_mode=cfg.mono.upsample_mode,
            dtype=dtype,
            border_mode="fast" if cfg.mono.fast_borders else "exact",
        )

    def program(variables, img):
        x = preprocess(img, net_hw, cfg.pre, compute_dtype=dtype)
        src_hw = img.shape[-3:-1]
        if use_packed and not post_process and tuple(src_hw) == net_hw:
            # Round-3 fast tail: sigmoid + disp→depth fused into the
            # packed layout on full-lane tiles (see collapsed.py). Only
            # when no resize sits between sigmoid and conversion and no
            # flip-TTA blending needs the raw sigmoid map.
            from scenedepthestimation_tpu.ops.collapsed import (
                collapsed_mono_decoder,
            )

            return collapsed_mono_decoder(
                variables["params"]["decoder"],
                _feats(variables, x),
                dec_channels=cfg.mono.dec_channels,
                upsample_mode=cfg.mono.upsample_mode,
                dtype=dtype,
                disp_to_depth_minmax=(cfg.mono.min_depth, cfg.mono.max_depth),
                border_mode="fast" if cfg.mono.fast_borders else "exact",
            )
        if post_process:
            x = jnp.concatenate([x, x[:, :, ::-1, :]], axis=0)
        disp0 = forward_disp0(variables, x).astype(jnp.float32)  # (B', h, w, 1)
        if post_process:
            b = img.shape[0]
            disp0 = _blend_flipped(disp0[:b], disp0[b:, :, ::-1, :])
        if tuple(src_hw) != net_hw:
            disp0 = resize_bilinear(disp0, src_hw, antialias=False)
        scaled_disp, depth = disp_to_depth(
            disp0[..., 0], cfg.mono.min_depth, cfg.mono.max_depth
        )
        return {"disp": scaled_disp, "depth": depth}

    return program


def _blend_flipped(disp: jnp.ndarray, disp_flip: jnp.ndarray) -> jnp.ndarray:
    """monodepth flip-averaging: ramp in the un-mirrored map near the
    left edge, the mirrored map near the right, mean in between."""
    w = disp.shape[2]
    xs = jnp.linspace(0.0, 1.0, w, dtype=disp.dtype)[None, None, :, None]
    # Family convention: full weight to the mirrored view inside the left
    # 5% border, ramp over the next 5%, symmetric on the right.
    l_mask = 1.0 - jnp.clip(20.0 * (xs - 0.05), 0.0, 1.0)
    r_mask = l_mask[:, :, ::-1, :]
    mean = 0.5 * (disp + disp_flip)
    return r_mask * disp + l_mask * disp_flip + (1.0 - l_mask - r_mask) * mean


# Preprocess + feature tower run once over the interleaved (2B, ...)
# pair instead of per-view: same math, half the fixed per-op cost at
# small batch (ROADMAP r3 #2). Module-global so bench/probe_paired.py
# can A/B it; flipped only for measurement, never at serving time.
_PAIRED_PRE: bool = True


def set_paired_pre(flag: bool) -> None:
    global _PAIRED_PRE
    _PAIRED_PRE = flag


# How the interleaved (2B, h4, w4, C) tower output is split back into
# (f_l, f_r). The round-3 loop trace (bench/trace_stereo_loop.py) showed
# the reshape+index form costing 2.56 ms/iter at config-5 b16 — 15% of
# the iteration — in a rank-5 split fusion plus three relayout copies.
# Variants (all exact; shard-local under batch DP):
#   "reshape": feats.reshape(b, 2, ...)[:, 0] / [:, 1]   (round-2 form)
#   "strided": lax.slice with batch stride 2 (no rank-5 intermediate)
# Measured e2e (bench/probe_pair_split.py, fori-amortized, iters
# 256/64): b2 795.7 reshape vs 783.4 strided, b16 914.8 vs 916.0 —
# a WASH: the split cluster's isolated trace cost is overlapped with
# the async weight prefetches in the compiled loop. Default stays the
# proven round-2 form.
_PAIR_SPLIT: str = "reshape"


def set_pair_split(mode: str) -> None:
    assert mode in ("reshape", "strided"), mode
    global _PAIR_SPLIT
    _PAIR_SPLIT = mode


def split_pair(feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(2B, ...) interleaved L/R stack → ((B, ...), (B, ...))."""
    from jax import lax

    if _PAIR_SPLIT == "strided":
        strides = (2,) + (1,) * (feats.ndim - 1)
        f_l = lax.slice(feats, (0,) * feats.ndim, feats.shape, strides)
        f_r = lax.slice(
            feats, (1,) + (0,) * (feats.ndim - 1), feats.shape, strides
        )
        return f_l, f_r
    b = feats.shape[0] // 2
    feats = feats.reshape(b, 2, *feats.shape[1:])
    return feats[:, 0], feats[:, 1]


def stereo_packed_supported(scfg) -> bool:
    """Shape/flag gate for the packed/collapsed stereo execution: the
    /4-feature grid must divide by 8 (three stride-2 encoder levels +
    even dims at every collapsed decoder level)."""
    return (
        scfg.packed_agg
        and (scfg.height // scfg.feat_stride) % 8 == 0
        and (scfg.width // scfg.feat_stride) % 8 == 0
    )


def stereo_packed_pair_forward(
    params, pair: jnp.ndarray, scfg, dtype, return_cost: bool = False
):
    """Packed-agg stereo forward from the INTERLEAVED (2B, h, w, c)
    preprocessed pair → full-res disparity (B, h, w) px.

    Exact rewrite of StereoNet.__call__ (sans the training-only aux
    cost heads) built from pure differentiable lax ops — shared by the
    inference program and, with ``StereoConfig.collapsed_train``, the
    train steps (gradients match the module path to reassociation
    error; tests/test_collapsed_train.py). ``return_cost`` appends the
    refined (B, h/4, w/4, D) cost logits for the aux CE loss.
    """
    from scenedepthestimation_tpu.models.stereo import FeatureTower
    from scenedepthestimation_tpu.ops.collapsed import (
        collapsed_cost_aggregation,
        refinement_forward,
    )
    from scenedepthestimation_tpu.ops.correlation import correlation1d
    from scenedepthestimation_tpu.ops.soft_argmin import soft_argmin
    from scenedepthestimation_tpu.ops.upsample import (
        upsample4x_bilinear_packed,
    )

    feats = FeatureTower(
        channels=scfg.feat_channels, dtype=dtype, name="tower"
    ).apply({"params": params["tower"]}, pair)
    f_l, f_r = split_pair(feats)
    cost = correlation1d(f_l, f_r, scfg.corr_disp)
    agg_in = jnp.concatenate([cost.astype(dtype), f_l], axis=-1)
    refined = collapsed_cost_aggregation(
        params["aggregation"], agg_in, dtype=dtype
    )
    q = soft_argmin(
        refined.astype(jnp.float32),
        temperature=scfg.softargmin_temperature,
    ) * float(scfg.feat_stride)
    if scfg.refine:
        q = refinement_forward(
            params["refinement"],
            f_l,
            q,
            float(scfg.corr_disp * scfg.feat_stride),
            dtype=dtype,
        )
    disp = upsample4x_bilinear_packed(q[..., None])[..., 0]
    if return_cost:
        return disp, refined
    return disp


def build_stereo_program(cfg: RunConfig, model: StereoNet):
    """Un-jitted end-to-end stereo program (SURVEY §3.2)."""
    net_hw = (cfg.stereo.height, cfg.stereo.width)
    dtype = _compute_dtype(cfg)
    # Collapsed/packed aggregation (ops/collapsed.py): exact inference
    # rewrite (shape gate in stereo_packed_supported). Refine
    # checkpoints ride it too (VERDICT r2 next-#2): the aux cost heads
    # are training-only, and the Refinement module runs as the
    # functional ops/collapsed.refinement_forward after the readout.
    use_packed_agg = stereo_packed_supported(cfg.stereo)

    def forward_pair(variables, pair):
        """Packed-agg forward from the INTERLEAVED (2B, h, w, c) pair —
        the tower consumes the preprocessed stack directly, no
        unstack/restack round trip between preprocess and tower."""
        return stereo_packed_pair_forward(
            variables["params"], pair, cfg.stereo, dtype
        )

    def forward(variables, xl, xr):
        if not use_packed_agg:
            return model.apply(variables, xl, xr)
        b, h, w, c_in = xl.shape
        # Shard-local pair interleave — mirrors StereoNet.__call__.
        pair = jnp.stack([xl, xr], axis=1).reshape(2 * b, h, w, c_in)
        return forward_pair(variables, pair)

    def program(variables, left, right):
        b = left.shape[0]
        if _PAIRED_PRE:
            # One preprocess over the interleaved pair instead of two
            # calls: same math, half the fixed per-op cost — the b2
            # stage profile showed preprocess x2 among the small-batch
            # overheads (BASELINE.md round-3 config-5 splits). The
            # (B, 2, ...) -> (2B) interleave is shard-local under batch
            # DP (same argument as the tower fold in models/stereo.py);
            # under packed agg the interleaved stack feeds the tower
            # directly — no unstack/restack between preprocess and
            # tower.
            pair = jnp.stack([left, right], axis=1)
            pair = pair.reshape((2 * b,) + pair.shape[2:])
            xp = preprocess(pair, net_hw, cfg.pre, compute_dtype=dtype)
            if use_packed_agg:
                disp = forward_pair(variables, xp)
            else:
                xp = xp.reshape((b, 2) + xp.shape[1:])
                disp = forward(variables, xp[:, 0], xp[:, 1])
        else:
            xl = preprocess(left, net_hw, cfg.pre, compute_dtype=dtype)
            xr = preprocess(right, net_hw, cfg.pre, compute_dtype=dtype)
            disp = forward(variables, xl, xr)  # (B, h, w) px @ net res
        disp = disp.astype(jnp.float32)
        src_hw = left.shape[-3:-1]
        if tuple(src_hw) != net_hw:
            # Disparities are horizontal offsets: rescale magnitudes by
            # the width ratio when resizing back to source resolution.
            scale = src_hw[1] / net_hw[1]
            disp = resize_bilinear(disp[..., None], src_hw, antialias=False)[..., 0]
            disp = disp * scale
        depth = depth_from_disparity(
            disp, cfg.stereo.focal_px, cfg.stereo.baseline_m
        )
        return {"disp": disp, "depth": depth}

    return program


class Predictor:
    """Holds weights + compiled programs for one pipeline config."""

    def __init__(self, cfg: RunConfig, variables: Dict[str, Any]):
        self.cfg = cfg
        self.variables = variables
        # Per-instance BOUNDED program cache (NOT functools.lru_cache on
        # methods: a class-level cache would pin self — weights included —
        # for the process lifetime after the caller drops the Predictor;
        # unbounded, a many-shapes server would accumulate executables).
        import collections

        self._programs: Any = collections.OrderedDict()
        self._programs_max = 8
        dtype = _compute_dtype(cfg)
        if cfg.pipeline == "mono":
            self.model = MonoDepthNet(cfg=cfg.mono, dtype=dtype)
        elif cfg.pipeline == "stereo":
            self.model = StereoNet(cfg=cfg.stereo, dtype=dtype)
        else:
            raise ValueError(f"unknown pipeline {cfg.pipeline!r}")

    # -- compiled end-to-end programs (cached per input shape) ----------

    def _cached(self, key, build):
        if key in self._programs:
            self._programs.move_to_end(key)
        else:
            self._programs[key] = jax.jit(build())
            if len(self._programs) > self._programs_max:
                self._programs.popitem(last=False)  # evict LRU
        return self._programs[key]

    def _mono_program(
        self, in_shape: Tuple[int, ...], in_dtype: str, post_process: bool = False
    ):
        return self._cached(
            ("mono", in_shape, in_dtype, post_process),
            lambda: build_mono_program(
                self.cfg, self.model, post_process=post_process
            ),
        )

    def _stereo_program(self, in_shape: Tuple[int, ...], in_dtype: str):
        return self._cached(
            ("stereo", in_shape, in_dtype),
            lambda: build_stereo_program(self.cfg, self.model),
        )

    # -- forward helpers -------------------------------------------------

    def mono_forward(
        self, img: jnp.ndarray, post_process: bool = False
    ) -> Dict[str, jnp.ndarray]:
        program = self._mono_program(
            tuple(img.shape), str(img.dtype), post_process
        )
        return program(self.variables, img)

    def stereo_forward(
        self, left: jnp.ndarray, right: jnp.ndarray
    ) -> Dict[str, jnp.ndarray]:
        program = self._stereo_program(tuple(left.shape), str(left.dtype))
        return program(self.variables, left, right)


# ---------------------------------------------------------------------------
# Module-level public API (the reference-compatible surface).
# ---------------------------------------------------------------------------


def load_weights(
    path: Optional[str],
    config: str | RunConfig = "mono_kitti_192x640_fp32",
    seed: int = 0,
) -> Predictor:
    """Load weights from an Orbax dir or torch .pth file(s) → Predictor.

    ``path=None`` random-initializes (used for golden-parity tests and
    benchmarks where no trained reference weights exist — the reference
    mount was empty, SURVEY.md Provenance).
    """
    cfg = configs.get(config) if isinstance(config, str) else config
    dtype = _compute_dtype(cfg)

    variables = None
    if path is not None:
        variables = checkpoint.load_variables(path, pipeline=cfg.pipeline)
        variables = jax.tree.map(jnp.asarray, variables)
        if (
            cfg.pipeline == "stereo"
            and not cfg.stereo.refine
            and "refinement" in variables.get("params", {})
        ):
            # A refine-trained checkpoint served with refine=False would
            # silently drop its refinement head (flax ignores extra
            # params) and return the coarse aux readout — auto-enable
            # instead (r2 review finding).
            import dataclasses

            cfg = dataclasses.replace(
                cfg, stereo=dataclasses.replace(cfg.stereo, refine=True)
            )

    if cfg.pipeline == "mono":
        model = MonoDepthNet(cfg=cfg.mono, dtype=dtype)
        dummy_args = (jnp.zeros((1, cfg.mono.height, cfg.mono.width, 3), dtype),)
    else:
        model = StereoNet(cfg=cfg.stereo, dtype=dtype)
        z = jnp.zeros((1, cfg.stereo.height, cfg.stereo.width, 3), dtype)
        dummy_args = (z, z)

    if variables is None:
        variables = model.init(jax.random.PRNGKey(seed), *dummy_args)
    return Predictor(cfg, variables)


def _ensure_batched(img: np.ndarray | jnp.ndarray) -> Tuple[jnp.ndarray, bool]:
    arr = jnp.asarray(img)
    if arr.ndim == 3:
        return arr[None], True
    if arr.ndim == 4:
        return arr, False
    raise ValueError(f"expected (H,W,3) or (B,H,W,3), got {arr.shape}")


def predict_mono(
    predictor: Predictor, image, post_process: bool = False
) -> Dict[str, np.ndarray]:
    """Depth map from a single RGB image (or batch). uint8 HWC in.

    Returns numpy {'depth': (.., H, W), 'disp': (.., H, W)} at the source
    resolution, squeezed if the input was unbatched. ``post_process``
    enables flip-averaging TTA (doubles compute).
    """
    img, squeeze = _ensure_batched(image)
    out = predictor.mono_forward(img, post_process=post_process)
    out = {k: np.asarray(v) for k, v in out.items()}
    if squeeze:
        out = {k: v[0] for k, v in out.items()}
    return out


def predict_stereo(predictor: Predictor, left, right) -> Dict[str, np.ndarray]:
    """Disparity + depth from a rectified stereo pair (or batch)."""
    l, squeeze = _ensure_batched(left)
    r, _ = _ensure_batched(right)
    if l.shape != r.shape:
        raise ValueError(
            f"left/right shapes must match: {l.shape} vs {r.shape} "
            f"(rectified pairs share a resolution)"
        )
    out = predictor.stereo_forward(l, r)
    out = {k: np.asarray(v) for k, v in out.items()}
    if squeeze:
        out = {k: v[0] for k, v in out.items()}
    return out


def predict_batch(predictor: Predictor, images, mesh=None):
    """Sharded batched inference (SURVEY §3.4). Thin wrapper for now;
    the pipelined multi-chip feed lives in parallel/feed.py (config 5)."""
    from scenedepthestimation_tpu.parallel import batch_inference

    return batch_inference(predictor, images, mesh=mesh)
