"""Flax ResNet-18/34/50 encoder (component C6 in SURVEY.md §2).

Built from scratch in NHWC layout (TPU-native: XLA tiles channels-last
convs straight onto the MXU). Semantics mirror the torchvision BasicBlock
ResNet exactly — same layer plan, strides, paddings, BN eps — so that a
reference ``.pth`` state dict can be imported by the name-mapping table in
``utils/torch_import.py`` (SURVEY C16). Returns the monodepth-style
5-level feature pyramid at strides /2, /4, /8, /16, /32.

Reference citation: SURVEY.md §2 C6 (reference mount empty — torchvision
``ResnetEncoder`` semantics are the E2-grade spec).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# Layer plan per depth; 18/34 use BasicBlock, 50 uses Bottleneck (x4
# channel expansion — torchvision semantics throughout).
RESNET_SPECS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
}
BOTTLENECK_DEPTHS = (50,)

BN_EPS = 1e-5  # torchvision BatchNorm2d default


class BasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3-bn-relu-conv3x3-bn + shortcut."""

    channels: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        residual = x
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn2",
        )(y)
        if self.stride != 1 or x.shape[-1] != self.channels:
            residual = nn.Conv(
                self.channels,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="downsample_bn",
            )(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3):
    conv1x1-bn-relu → conv3x3(stride)-bn-relu → conv1x1(x4)-bn + shortcut.
    Module names mirror torchvision keys so the .pth importer's
    structural mapping (utils/torch_import.py) applies unchanged."""

    channels: int  # bottleneck width; block output is 4x this
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name=name,
            )

        residual = x
        y = nn.Conv(
            self.channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv1"
        )(x)
        y = nn.relu(bn("bn1")(y))
        y = nn.Conv(
            self.channels,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(
            4 * self.channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv3",
        )(y)
        y = bn("bn3")(y)
        if self.stride != 1 or x.shape[-1] != 4 * self.channels:
            residual = nn.Conv(
                4 * self.channels,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            residual = bn("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """5-level feature pyramid encoder (strides /2 /4 /8 /16 /32).

    Channel plan: (64, 64, 128, 256, 512) for ResNet-18/34 (BasicBlock),
    (64, 256, 512, 1024, 2048) for ResNet-50 (Bottleneck).
    """

    num_layers: int = 18
    dtype: jnp.dtype = jnp.float32

    @property
    def num_ch_enc(self) -> Tuple[int, ...]:
        if self.num_layers in BOTTLENECK_DEPTHS:
            return (64, 256, 512, 1024, 2048)
        return (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Sequence[jnp.ndarray]:
        if self.num_layers not in RESNET_SPECS:
            raise ValueError(f"unsupported depth {self.num_layers}")
        blocks = RESNET_SPECS[self.num_layers]

        features = []
        y = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn1",
        )(y)
        y = nn.relu(y)
        features.append(y)  # /2, 64ch

        # torch MaxPool2d(3, stride=2, padding=1): explicit -inf padding so
        # border maxima match torch exactly (avg-style SAME would differ).
        y = nn.max_pool(
            y,
            window_shape=(3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
        )

        stage_channels = (64, 128, 256, 512)
        block_cls = (
            Bottleneck if self.num_layers in BOTTLENECK_DEPTHS else BasicBlock
        )
        for stage, (ch, n_blocks) in enumerate(zip(stage_channels, blocks)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = block_cls(
                    channels=ch,
                    stride=stride,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(y, train=train)
            features.append(y)

        return features
