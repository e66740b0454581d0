"""Stereo disparity network (SURVEY C9 + C10 + C11 + C12).

DispNetC/FADNet-lineage design (PAPERS.md:5,9 — the mount was empty, so
the architecture is the E1/E2-grade spec from SURVEY §2), re-designed
TPU-first:

* Siamese feature tower (C9): shared-weight conv stack downsampling both
  views to stride ``feat_stride`` (default /4). The pair is folded into
  the batch axis (one big conv instead of two half-size ones — better MXU
  occupancy than vmap-ing two calls).
* 1-D correlation cost volume (C10): ops/correlation, (B, H/4, W/4, D).
* Cost aggregation (C11): a 2-D conv U-Net over the cost volume
  concatenated with left-view features (FADNet-style 2-D processing, not
  GC-Net 3-D convs — 2-D convs are MXU-dense; 3-D convs lower poorly).
* Soft-argmin readout (C12): ops/soft_argmin → disparity at /4, scaled by
  ``feat_stride`` and bilinearly upsampled to full resolution (in px).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from scenedepthestimation_tpu.configs import StereoConfig
from scenedepthestimation_tpu.ops.correlation import correlation1d
from scenedepthestimation_tpu.ops.soft_argmin import soft_argmin
from scenedepthestimation_tpu.ops.upsample import (
    upsample2x,
    upsample4x_bilinear_packed,
    upsample_concat,
)


class ConvRelu(nn.Module):
    channels: int
    stride: int = 1
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.kernel // 2
        y = nn.Conv(
            self.channels,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.relu(y)


class FeatureTower(nn.Module):
    """Shared-weight feature extractor, /4 downsampling (SURVEY C9)."""

    channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ConvRelu(32, stride=2, kernel=5, dtype=self.dtype, name="down1")(x)
        y = ConvRelu(self.channels, stride=2, kernel=5, dtype=self.dtype, name="down2")(y)
        y = ConvRelu(self.channels, dtype=self.dtype, name="refine1")(y)
        y = ConvRelu(self.channels, dtype=self.dtype, name="refine2")(y)
        return y


class CostAggregation(nn.Module):
    """2-D conv U-Net over (cost ++ left features) → refined cost logits.

    Output is *matching cost* over D (lower = better) to feed soft-argmin.
    With ``aux_heads`` the decoder also emits cost volumes at the /2 and
    /4 internal scales (DispNetC-lineage intermediate supervision,
    PAPERS.md:5 — anchors the soft-argmin against its uniform-softmax
    collapse mode; see VERDICT r1 weak #5). Opt-in: it adds params, so
    the default keeps reference checkpoint-parity.
    """

    out_disp: int
    channels: tuple = (64, 96, 128, 160)
    aux_heads: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c0, c1, c2, c3 = self.channels
        e0 = ConvRelu(c0, dtype=self.dtype, name="enc0")(x)
        e1 = ConvRelu(c1, stride=2, dtype=self.dtype, name="enc1")(e0)
        e1 = ConvRelu(c1, dtype=self.dtype, name="enc1b")(e1)
        e2 = ConvRelu(c2, stride=2, dtype=self.dtype, name="enc2")(e1)
        e2 = ConvRelu(c2, dtype=self.dtype, name="enc2b")(e2)
        e3 = ConvRelu(c3, stride=2, dtype=self.dtype, name="enc3")(e2)
        e3 = ConvRelu(c3, dtype=self.dtype, name="enc3b")(e3)

        d2 = ConvRelu(c2, dtype=self.dtype, name="dec2")(
            upsample_concat(e3, e2, mode="nearest")
        )
        d1 = ConvRelu(c1, dtype=self.dtype, name="dec1")(
            upsample_concat(d2, e1, mode="nearest")
        )
        d0 = ConvRelu(c0, dtype=self.dtype, name="dec0")(
            upsample_concat(d1, e0, mode="nearest")
        )
        # Linear head: cost logits over the disparity axis.
        cost = nn.Conv(
            self.out_disp,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            name="cost_head",
        )(d0)
        if not self.aux_heads:
            return cost
        aux = [
            nn.Conv(
                self.out_disp,
                (3, 3),
                padding=((1, 1), (1, 1)),
                dtype=self.dtype,
                name=f"cost_head_s{s}",
            )(d)
            for s, d in ((1, d1), (2, d2))
        ]
        return cost, aux


class Refinement(nn.Module):
    """FADNet-style residual disparity refinement (PAPERS.md:5).

    Takes the left features and the (normalized) soft-argmin disparity,
    predicts a residual. The residual head is zero-initialized so an
    enabled refinement starts as the identity — training can only
    improve on the coarse readout, and the lr-collapse mode (a frozen
    constant readout) gains an escape path that bypasses the softmax.
    PROVEN in the round-3 collapse study (BASELINE.md rescue table):
    at lr 1e-3 seed 1 the plain model collapses to EPE 9.58 while
    refine converges to 0.512 — the escape path is refinement's
    measured value on the synthetic set.
    """

    max_disp: float
    channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f_l: jnp.ndarray, disp_q: jnp.ndarray) -> jnp.ndarray:
        x = jnp.concatenate(
            [f_l, (disp_q / self.max_disp).astype(self.dtype)[..., None]],
            axis=-1,
        )
        y = ConvRelu(self.channels, dtype=self.dtype, name="conv1")(x)
        y = ConvRelu(self.channels, dtype=self.dtype, name="conv2")(y)
        r = nn.Conv(
            1,
            (3, 3),
            padding=((1, 1), (1, 1)),
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros_init(),
            name="residual",
        )(y)
        return disp_q + r[..., 0].astype(jnp.float32) * self.max_disp


class StereoNet(nn.Module):
    """left, right (B, H, W, 3) normalized → full-res disparity (B, H, W) px.

    With ``cfg.refine`` the soft-argmin readout passes through a residual
    :class:`Refinement` stage and ``__call__(..., return_aux=True)``
    additionally returns the pre-refinement and intermediate-scale
    disparities (full-res px) for multi-scale supervision.
    """

    cfg: StereoConfig = StereoConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        left: jnp.ndarray,
        right: jnp.ndarray,
        return_aux: bool = False,
        return_cost: bool = False,
    ):
        """``return_cost`` appends the refined cost logits (B, H/4, W/4,
        D) to the returns — consumed by the disparity-classification
        auxiliary loss (losses.disparity_classification_loss)."""
        b, h, w, c_in = left.shape
        # Fold the stereo pair into the batch axis for the shared tower —
        # one big conv beats two half-size calls on the MXU. Interleave as
        # (B, 2, ...) → (2B, ...) rather than concat([L, R], axis=0): with
        # the batch axis sharded over a data-parallel mesh the interleaved
        # reshape stays shard-LOCAL, while a concat would place L and R on
        # different chips and the split-back would compile to a
        # collective-permute (caught by tests/test_sharding.py's
        # zero-collectives HLO assertion).
        pair = jnp.stack([left, right], axis=1).reshape(2 * b, h, w, c_in)
        feats = FeatureTower(
            channels=self.cfg.feat_channels, dtype=self.dtype, name="tower"
        )(pair)
        feats = feats.reshape(b, 2, *feats.shape[1:])
        f_l, f_r = feats[:, 0], feats[:, 1]

        d_corr = self.cfg.corr_disp
        cost = correlation1d(f_l, f_r, d_corr)  # (B, H/4, W/4, D)

        agg_in = jnp.concatenate([cost.astype(self.dtype), f_l], axis=-1)
        agg_out = CostAggregation(
            out_disp=d_corr,
            channels=self.cfg.agg_channels,
            aux_heads=self.cfg.refine,
            dtype=self.dtype,
            name="aggregation",
        )(agg_in)
        refined, aux_costs = agg_out if self.cfg.refine else (agg_out, [])

        tau = self.cfg.softargmin_temperature

        def readout(c):
            # Soft-argmin in fp32: the softmax over D is precision-sensitive.
            q = soft_argmin(c.astype(jnp.float32), temperature=tau)
            return q * float(self.cfg.feat_stride)  # full-res px units

        disp_q = readout(refined)  # (B, H/4, W/4)
        aux_full = []
        if self.cfg.refine:
            if return_aux:
                # Pre-refinement + intermediate scales, upsampled to full
                # res (monodepth-style multi-scale supervision target).
                aux_full.append(_up_to_full(disp_q, h, w))
                for c in aux_costs:
                    aux_full.append(_up_to_full(readout(c), h, w))
            disp_q = Refinement(
                max_disp=float(d_corr * self.cfg.feat_stride),
                dtype=self.dtype,
                name="refinement",
            )(f_l, disp_q)

        # Parity-plane form of the x4 bilinear: the naive nested-2x
        # interleave runs a 1-channel tensor at 1/128 lane utilization
        # (measured 3.7 ms at config 5 — bench/profile_stereo.py).
        disp = upsample4x_bilinear_packed(disp_q[..., None])[..., 0]
        if return_aux and return_cost:
            return disp, aux_full, refined
        if return_aux:
            return disp, aux_full
        if return_cost:
            return disp, refined
        return disp


def _up_to_full(disp_q: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Bilinear-upsample a coarse (B, h', w') disparity to (B, h, w).
    Values are already in full-res pixel units."""
    x = disp_q[..., None]
    while x.shape[1] < h:
        x = upsample2x(x, mode="bilinear")
    assert x.shape[1] == h and x.shape[2] == w, (x.shape, h, w)
    return x[..., 0]
