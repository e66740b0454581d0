"""U-Net depth decoder with multi-scale disparity heads (SURVEY C7 + C13).

monodepth2-lineage semantics (E2 — the mount was empty): per level,
``conv3x3(reflect-pad)+ELU → upsample ×2 → concat skip → conv3x3+ELU``,
with a ``conv3x3 → sigmoid`` disparity head at each of 4 scales. The
decoder channel plan (16, 32, 64, 128, 256) and the reflect padding are
UNVERIFIED vs reference and isolated in configs.MonoConfig / here.

TPU-first notes: NHWC layout; the upsample is a broadcast (ops/upsample),
so each level is two MXU convs plus fusible elementwise glue.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedepthestimation_tpu.ops.upsample import upsample_concat, upsample2x

# Default OFF by measurement: end-to-end mono bench at b64 is 603.7
# fps/chip with XLA ConvBlocks vs 306.9 with the fused Pallas kernel —
# the triple halo-window reads plus the 128-lane padding of C=16 VMEM
# blocks cost more than the pad-copy + ELU passes they remove. The
# kernel stays in-tree with its numbers (BASELINE.md); `None` = same as
# False until a layout-packed variant wins.
_USE_FUSED_CONV: bool | None = None


def set_use_fused_conv(flag: bool | None) -> None:
    global _USE_FUSED_CONV
    _USE_FUSED_CONV = flag


def _reflect_pad(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")


class PallasConv3x3(nn.Module):
    """reflect-pad 3x3 conv + activation with an identical param tree to
    ``nn.Conv`` (kernel (3,3,Cin,Cout), bias (Cout,), same default init)
    so checkpoints and the torch importer are agnostic to the backend.
    Dispatches to the fused Pallas kernel on TPU (forward fused, backward
    = exact XLA VJP), XLA reference path elsewhere."""

    features: int
    activation: str = "elu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from scenedepthestimation_tpu.ops.pallas.conv_block import (
            _pick_th,
            conv3x3_fused,
            conv3x3_xla,
        )

        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)

        use = bool(_USE_FUSED_CONV)
        tileable = _pick_th(
            x.shape[1], x.shape[2], cin, self.features, x.dtype.itemsize
        )
        if use and tileable > 0:
            return conv3x3_fused(x, kernel, bias, self.activation)
        return conv3x3_xla(x, kernel, bias, self.activation)


class ConvBlock(nn.Module):
    """3x3 conv with reflection padding followed by ELU (decoder hot op)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return PallasConv3x3(
            features=self.channels,
            activation="elu",
            dtype=self.dtype,
            name="conv",
        )(x)


class DispHead(nn.Module):
    """3x3 conv (reflect pad) → sigmoid disparity in [0, 1]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Conv(
            1, (3, 3), padding="VALID", dtype=self.dtype, name="conv"
        )(_reflect_pad(x))
        # Sigmoid in fp32: bf16 saturates the tails and costs abs-rel.
        return nn.sigmoid(y.astype(jnp.float32))


class DepthDecoder(nn.Module):
    """Top-down decoder over the 5-level encoder pyramid.

    Returns ``{scale: disparity (B, H/2^s, W/2^s, 1)}`` for each scale in
    ``scales`` (0 = input resolution).
    """

    dec_channels: Tuple[int, ...] = (16, 32, 64, 128, 256)
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    upsample_mode: str = "nearest"
    use_skips: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]) -> Dict[int, jnp.ndarray]:
        outputs: Dict[int, jnp.ndarray] = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(
                self.dec_channels[i], dtype=self.dtype, name=f"upconv_{i}_0"
            )(x)
            if self.use_skips and i > 0:
                x = upsample_concat(x, features[i - 1], mode=self.upsample_mode)
            else:
                x = upsample2x(x, mode=self.upsample_mode)
            x = ConvBlock(
                self.dec_channels[i], dtype=self.dtype, name=f"upconv_{i}_1"
            )(x)
            if i in self.scales:
                outputs[i] = DispHead(dtype=self.dtype, name=f"dispconv_{i}")(x)
        return outputs
