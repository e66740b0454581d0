"""Inference-time BatchNorm folding for the ResNet encoder (SURVEY C6).

At inference BN is an affine map with frozen statistics:

    bn(y) = γ·(y − μ)/√(σ²+ε) + β = y·s + (β − μ·s),   s = γ/√(σ²+ε)

so every conv→bn pair folds into a single conv with kernel·s and bias
(β − μ·s). On TPU this matters beyond the (tiny) FLOPs: XLA emits BN as
a separate elementwise pass over the activation (the round-1 profile's
"unfused epilogue" finding), so each fold removes a full HBM read+write
of a (B, H, W, C) tensor — ~10 such passes at the judged b128 shape.

Folding happens OUTSIDE the jitted program (load/build time), in fp32
regardless of compute dtype; the folded forward mirrors
models/resnet.ResNetEncoder exactly (tests/test_folded.py pins parity
against the unfolded module with randomized statistics).

Used by api.build_mono_program for inference programs; training keeps
the live-statistics BatchNorm path.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from scenedepthestimation_tpu.models.resnet import BN_EPS, RESNET_SPECS


def _fold(conv, bn, stats):
    scale = (bn["scale"].astype(jnp.float32)
             / jnp.sqrt(stats["var"].astype(jnp.float32) + BN_EPS))
    return {
        "kernel": conv["kernel"].astype(jnp.float32) * scale,
        "bias": bn["bias"].astype(jnp.float32)
        - stats["mean"].astype(jnp.float32) * scale,
    }


def fold_encoder_bn(params, batch_stats, num_layers: int = 18):
    """Encoder param + batch_stats trees → folded {name: {kernel, bias}}
    tree (fp32) for :func:`folded_encoder_apply`."""
    folded = {"conv1": _fold(params["conv1"], params["bn1"], batch_stats["bn1"])}
    for stage, n_blocks in enumerate(RESNET_SPECS[num_layers]):
        for b in range(n_blocks):
            name = f"layer{stage + 1}_{b}"
            bp, bs = params[name], batch_stats[name]
            blk = {
                "conv1": _fold(bp["conv1"], bp["bn1"], bs["bn1"]),
                "conv2": _fold(bp["conv2"], bp["bn2"], bs["bn2"]),
            }
            if "conv3" in bp:  # Bottleneck (ResNet-50)
                blk["conv3"] = _fold(bp["conv3"], bp["bn3"], bs["bn3"])
            if "downsample_conv" in bp:
                blk["downsample"] = _fold(
                    bp["downsample_conv"], bp["downsample_bn"], bs["downsample_bn"]
                )
            folded[name] = blk
    return folded


def _conv(t, x, stride: int, pad: int, dtype):
    y = lax.conv_general_dilated(
        x,
        t["kernel"].astype(dtype),
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + t["bias"].astype(dtype)


def folded_encoder_apply(
    folded,
    x: jnp.ndarray,
    num_layers: int = 18,
    dtype=jnp.float32,
    s2d_stem: bool = False,
) -> Sequence[jnp.ndarray]:
    """Mirror of ResNetEncoder.__call__ (inference) over a folded tree.

    ``s2d_stem`` runs conv1 through the space-to-depth rewrite
    (ops/stem.py): exact, and ~3x faster at the judged shape because the
    7x7-on-C=3 form starves the MXU contraction dim (BASELINE.md r3).
    Requires even H, W.
    """
    features = []
    xd = x.astype(dtype)
    if s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
        from scenedepthestimation_tpu.ops.stem import (
            s2d_stem_conv,
            s2d_stem_kernel,
        )

        t = folded["conv1"]
        y = s2d_stem_conv(xd, s2d_stem_kernel(t["kernel"].astype(dtype)), 7)
        y = nn.relu(y + t["bias"].astype(dtype))
    else:
        y = nn.relu(_conv(folded["conv1"], xd, 2, 3, dtype))
    features.append(y)  # /2, 64ch

    y = nn.max_pool(
        y, window_shape=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )
    stage_channels = (64, 128, 256, 512)
    for stage, (ch, n_blocks) in enumerate(
        zip(stage_channels, RESNET_SPECS[num_layers])
    ):
        for b in range(n_blocks):
            stride = 2 if (b == 0 and stage > 0) else 1
            blk = folded[f"layer{stage + 1}_{b}"]
            residual = y
            if "conv3" in blk:  # Bottleneck: 1x1 → 3x3(stride) → 1x1
                z = nn.relu(_conv(blk["conv1"], y, 1, 0, dtype))
                z = nn.relu(_conv(blk["conv2"], z, stride, 1, dtype))
                z = _conv(blk["conv3"], z, 1, 0, dtype)
            else:  # BasicBlock
                z = nn.relu(_conv(blk["conv1"], y, stride, 1, dtype))
                z = _conv(blk["conv2"], z, 1, 1, dtype)
            if "downsample" in blk:
                residual = _conv(blk["downsample"], y, stride, 0, dtype)
            y = nn.relu(z + residual)
        features.append(y)
    return features
