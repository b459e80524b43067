"""ResNet backbones.

Reference parity: ``src/openpifpaf/network/basenetworks.py:~320`` — the
ResNet family with openpifpaf's modifications: the input max-pool is
removable (``--resnet-pool0-stride``, default 0 = removed, giving total
stride 16) and the input conv stride and block5 dilation are configurable.

TPU-first: NHWC, bfloat16-capable compute, float32 params.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet


class Bottleneck(nn.Module):
    out_channels: int  # expanded (4x) output channels
    stride: int = 1
    dilation: int = 1
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        width = self.out_channels // 4

        residual = x
        y = nn.Conv(width, (1, 1), name='conv1', **kw)(x)
        y = norm(self, 'bn1', y, train)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=self.stride,
                    padding=self.dilation, kernel_dilation=self.dilation,
                    name='conv2', **kw)(y)
        y = norm(self, 'bn2', y, train)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), name='conv3', **kw)(y)
        y = norm(self, 'bn3', y, train)

        if residual.shape[-1] != self.out_channels or self.stride != 1:
            residual = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                               name='downsample_conv', **kw)(x)
            residual = norm(self, 'downsample_bn', residual, train)

        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet-{50,101,152} trunk without avgpool/fc."""

    layers: Sequence[int]
    input_conv_stride: int = 2
    pool0_stride: int = 0       # 0 = removed (openpifpaf default -> stride 16)
    block5_dilation: int = 1
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=self.input_conv_stride, padding=3,
                    name='conv1', **kw)(x)
        x = norm(self, 'bn1', x, train)
        x = nn.relu(x)
        if self.pool0_stride > 1:
            x = nn.max_pool(x, (3, 3), strides=(self.pool0_stride,) * 2,
                            padding=((1, 1), (1, 1)))

        channels = (256, 512, 1024, 2048)
        strides = (1, 2, 2, 2 if self.block5_dilation == 1 else 1)
        dilations = (1, 1, 1, self.block5_dilation)
        for stage_i, (n_blocks, ch, s, d) in enumerate(
                zip(self.layers, channels, strides, dilations), start=1):
            x = Bottleneck(ch, s, d, self.norm, self.dtype,
                           name=f'layer{stage_i}_0')(x, train)
            for block_i in range(1, n_blocks):
                x = Bottleneck(ch, 1, d, self.norm, self.dtype,
                               name=f'layer{stage_i}_{block_i}')(x, train)
        return x


def _make(layers):
    def factory(norm: str = 'batchnorm', dtype=jnp.float32, **kwargs):
        return ResNet(layers=layers, norm=norm, dtype=dtype, **kwargs)
    return factory


register_basenet(BaseNetworkSpec('resnet50', _make((3, 4, 6, 3)),
                                 stride=16, out_features=2048))
register_basenet(BaseNetworkSpec('resnet101', _make((3, 4, 23, 3)),
                                 stride=16, out_features=2048))
register_basenet(BaseNetworkSpec('resnet152', _make((3, 8, 36, 3)),
                                 stride=16, out_features=2048))
