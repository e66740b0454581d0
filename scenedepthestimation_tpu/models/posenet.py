"""Pose network for temporal self-supervised training (SURVEY C14,
monodepth2 lineage): a ResNet-18 encoder over the channel-concatenated
frame pair followed by a small conv head regressing a 6-DoF relative
pose (axis-angle + translation), scaled by 0.01 (the lineage's
stabilization constant — UNVERIFIED vs reference).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from scenedepthestimation_tpu.models.resnet import ResNetEncoder


class PoseDecoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(
            nn.Conv(256, (1, 1), dtype=self.dtype, name="squeeze")(feat)
        )
        y = nn.relu(
            nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="pose_0")(y)
        )
        y = nn.relu(
            nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="pose_1")(y)
        )
        y = nn.Conv(6, (1, 1), dtype=self.dtype, name="pose_2")(y)
        # Global average over space, scaled for stable early training.
        return 0.01 * jnp.mean(y.astype(jnp.float32), axis=(1, 2))  # (B, 6)


class PoseNet(nn.Module):
    """(B, H, W, 6) stacked frame pair → axisangle (B, 3), translation (B, 3)."""

    num_layers: int = 18
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, pair: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = ResNetEncoder(
            num_layers=self.num_layers, dtype=self.dtype, name="encoder"
        )(pair, train=train)
        pose = PoseDecoder(dtype=self.dtype, name="decoder")(feats[-1])
        return pose[:, :3], pose[:, 3:]
