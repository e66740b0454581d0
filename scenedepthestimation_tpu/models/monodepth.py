"""Monocular depth network: ResNet encoder + U-Net decoder (SURVEY C6+C7).

The full predict stack (SURVEY §3.1): normalized image → encoder → decoder
→ multi-scale sigmoid disparities. disp→depth conversion is applied by the
API layer (ops/disp_to_depth) so eval code can access raw disparities.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from scenedepthestimation_tpu.configs import MonoConfig
from scenedepthestimation_tpu.models.resnet import ResNetEncoder
from scenedepthestimation_tpu.models.unet_decoder import DepthDecoder


class MonoDepthNet(nn.Module):
    """Input: normalized (B, H, W, 3). Output: {scale: sigmoid disparity}."""

    cfg: MonoConfig = MonoConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[int, jnp.ndarray]:
        features = ResNetEncoder(
            num_layers=self.cfg.num_layers, dtype=self.dtype, name="encoder"
        )(x, train=train)
        return DepthDecoder(
            dec_channels=self.cfg.dec_channels,
            scales=self.cfg.scales,
            upsample_mode=self.cfg.upsample_mode,
            dtype=self.dtype,
            name="decoder",
        )(features)
