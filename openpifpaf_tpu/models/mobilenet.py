"""MobileNetV2 / MobileNetV3 backbones.

Reference parity: ``src/openpifpaf/network/basenetworks.py:~420``
(``MobileNetV2``, ``MobileNetV3``) — the reference wraps torchvision's
feature extractors; here the inverted-residual stacks are built directly.
As in the reference's pose configuration, the final downsampling stage runs
at stride 1 so the trunk's total stride is 16.

TPU-first: NHWC, depthwise convs via ``feature_group_count``, bfloat16
compute with float32 params; squeeze-excitation reductions are tiny matmuls
XLA keeps on-chip.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet


def hard_sigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


def hard_swish(x):
    return x * hard_sigmoid(x)


class SqueezeExcite(nn.Module):
    reduce_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Conv(self.reduce_channels, (1, 1), name='fc1', **kw)(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), name='fc2', **kw)(s)
        return x * hard_sigmoid(s)


class InvertedResidual(nn.Module):
    """MBConv block: 1x1 expand -> k x k depthwise -> SE? -> 1x1 project."""

    out_channels: int
    expand_channels: int
    kernel_size: int = 3
    stride: int = 1
    use_se: bool = False
    activation: str = 'relu6'     # 'relu6' | 'hardswish'
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        act = hard_swish if self.activation == 'hardswish' else nn.relu6
        pad = self.kernel_size // 2

        y = x
        if self.expand_channels != x.shape[-1]:
            y = nn.Conv(self.expand_channels, (1, 1), name='expand', **kw)(y)
            y = norm(self, 'expand_norm', y, train)
            y = act(y)
        y = nn.Conv(self.expand_channels,
                    (self.kernel_size, self.kernel_size),
                    strides=self.stride, padding=pad,
                    feature_group_count=self.expand_channels,
                    name='dwconv', **kw)(y)
        y = norm(self, 'dw_norm', y, train)
        y = act(y)
        if self.use_se:
            y = SqueezeExcite(max(8, self.expand_channels // 4),
                              self.dtype, name='se')(y)
        y = nn.Conv(self.out_channels, (1, 1), name='project', **kw)(y)
        y = norm(self, 'project_norm', y, train)

        if self.stride == 1 and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """(t, c, n, s) config; the last stride-2 stage runs at stride 1."""

    # (expansion, channels, repeats, stride)
    config: Sequence[Tuple[int, int, int, int]] = (
        (1, 16, 1, 1),
        (6, 24, 2, 2),
        (6, 32, 3, 2),
        (6, 64, 4, 2),
        (6, 96, 3, 1),
        (6, 160, 3, 1),   # torchvision stride 2; stride 1 here -> total 16
        (6, 320, 1, 1),
    )
    out_channels: int = 1280
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=2, padding=1, name='conv_stem',
                    **kw)(x)
        x = norm(self, 'stem_norm', x, train)
        x = nn.relu6(x)

        block_i = 0
        for t, c, n, s in self.config:
            for i in range(n):
                x = InvertedResidual(
                    out_channels=c, expand_channels=t * x.shape[-1],
                    stride=s if i == 0 else 1, norm=self.norm,
                    dtype=self.dtype, name=f'block{block_i}')(x, train)
                block_i += 1

        x = nn.Conv(self.out_channels, (1, 1), name='conv_head', **kw)(x)
        x = norm(self, 'head_norm', x, train)
        return nn.relu6(x)


class MobileNetV3(nn.Module):
    """MobileNetV3-Large feature trunk at total stride 16."""

    # (kernel, expand, out, se, activation, stride)
    config: Sequence[Tuple[int, int, int, bool, str, int]] = (
        (3, 16, 16, False, 'relu6', 1),
        (3, 64, 24, False, 'relu6', 2),
        (3, 72, 24, False, 'relu6', 1),
        (5, 72, 40, True, 'relu6', 2),
        (5, 120, 40, True, 'relu6', 1),
        (5, 120, 40, True, 'relu6', 1),
        (3, 240, 80, False, 'hardswish', 2),
        (3, 200, 80, False, 'hardswish', 1),
        (3, 184, 80, False, 'hardswish', 1),
        (3, 184, 80, False, 'hardswish', 1),
        (3, 480, 112, True, 'hardswish', 1),
        (3, 672, 112, True, 'hardswish', 1),
        (5, 672, 160, True, 'hardswish', 1),  # torchvision stride 2
        (5, 960, 160, True, 'hardswish', 1),
        (5, 960, 160, True, 'hardswish', 1),
    )
    out_channels: int = 960
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = nn.Conv(16, (3, 3), strides=2, padding=1, name='conv_stem',
                    **kw)(x)
        x = norm(self, 'stem_norm', x, train)
        x = hard_swish(x)

        for block_i, (k, e, c, se, act, s) in enumerate(self.config):
            x = InvertedResidual(
                out_channels=c, expand_channels=e, kernel_size=k,
                stride=s, use_se=se, activation=act, norm=self.norm,
                dtype=self.dtype, name=f'block{block_i}')(x, train)

        x = nn.Conv(self.out_channels, (1, 1), name='conv_head', **kw)(x)
        x = norm(self, 'head_norm', x, train)
        return hard_swish(x)


register_basenet(BaseNetworkSpec(
    'mobilenetv2',
    lambda norm='batchnorm', dtype=jnp.float32, **kw: MobileNetV2(
        norm=norm, dtype=dtype, **kw),
    stride=16, out_features=1280))
register_basenet(BaseNetworkSpec(
    'mobilenetv3large',
    lambda norm='batchnorm', dtype=jnp.float32, **kw: MobileNetV3(
        norm=norm, dtype=dtype, **kw),
    stride=16, out_features=960))
