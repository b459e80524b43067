"""EfficientNetV2 backbones.

Reference parity: ``src/openpifpaf/network/basenetworks.py:~540``
(``EffNetV2``) — fused-MBConv early stages + MBConv later stages.  As with
the other pose trunks, the final downsampling stage runs at stride 1 so the
total stride is 16.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet
from .mobilenet import InvertedResidual, SqueezeExcite


class FusedMBConv(nn.Module):
    """Fused-MBConv: single k x k conv expand -> 1x1 project."""

    out_channels: int
    expand_ratio: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        pad = self.kernel_size // 2
        expand = self.expand_ratio * x.shape[-1]

        y = nn.Conv(expand, (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=pad, name='expand', **kw)(x)
        y = norm(self, 'expand_norm', y, train)
        y = nn.silu(y)
        if self.expand_ratio != 1:
            y = nn.Conv(self.out_channels, (1, 1), name='project', **kw)(y)
            y = norm(self, 'project_norm', y, train)
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class MBConvV2(nn.Module):
    """EfficientNetV2 MBConv (SiLU + SE with 1/4 of input channels)."""

    out_channels: int
    expand_ratio: int
    kernel_size: int = 3
    stride: int = 1
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        expand = self.expand_ratio * x.shape[-1]
        pad = self.kernel_size // 2

        y = nn.Conv(expand, (1, 1), name='expand', **kw)(x)
        y = norm(self, 'expand_norm', y, train)
        y = nn.silu(y)
        y = nn.Conv(expand, (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=pad,
                    feature_group_count=expand, name='dwconv', **kw)(y)
        y = norm(self, 'dw_norm', y, train)
        y = nn.silu(y)
        y = SqueezeExcite(max(8, x.shape[-1] // 4), self.dtype, name='se')(y)
        y = nn.Conv(self.out_channels, (1, 1), name='project', **kw)(y)
        y = norm(self, 'project_norm', y, train)
        if self.stride == 1 and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class EffNetV2(nn.Module):
    """EfficientNetV2 trunk; config rows: (block, expand, c, n, s)."""

    # EfficientNetV2-S with the last stage at stride 1 (total stride 16)
    config: Sequence[Tuple[str, int, int, int, int]] = (
        ('fused', 1, 24, 2, 1),
        ('fused', 4, 48, 4, 2),
        ('fused', 4, 64, 4, 2),
        ('mbconv', 4, 128, 6, 2),
        ('mbconv', 6, 160, 9, 1),
        ('mbconv', 6, 256, 15, 1),   # reference stride 2 -> 1 here
    )
    out_channels: int = 1280
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = nn.Conv(24, (3, 3), strides=2, padding=1, name='conv_stem',
                    **kw)(x)
        x = norm(self, 'stem_norm', x, train)
        x = nn.silu(x)

        block_i = 0
        for kind, e, c, n, s in self.config:
            for i in range(n):
                cls = FusedMBConv if kind == 'fused' else MBConvV2
                x = cls(out_channels=c, expand_ratio=e,
                        stride=s if i == 0 else 1, norm=self.norm,
                        dtype=self.dtype, name=f'block{block_i}')(x, train)
                block_i += 1

        x = nn.Conv(self.out_channels, (1, 1), name='conv_head', **kw)(x)
        x = norm(self, 'head_norm', x, train)
        return nn.silu(x)


_M_CONFIG = (
    ('fused', 1, 24, 3, 1),
    ('fused', 4, 48, 5, 2),
    ('fused', 4, 80, 5, 2),
    ('mbconv', 4, 160, 7, 2),
    ('mbconv', 6, 176, 14, 1),
    ('mbconv', 6, 304, 18, 1),
    ('mbconv', 6, 512, 5, 1),
)

register_basenet(BaseNetworkSpec(
    'effnetv2s',
    lambda norm='batchnorm', dtype=jnp.float32, **kw: EffNetV2(
        norm=norm, dtype=dtype, **kw),
    stride=16, out_features=1280))
register_basenet(BaseNetworkSpec(
    'effnetv2m',
    lambda norm='batchnorm', dtype=jnp.float32, **kw: EffNetV2(
        config=_M_CONFIG, norm=norm, dtype=dtype, **kw),
    stride=16, out_features=1280))
