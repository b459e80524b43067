"""ShuffleNetV2K backbone — the openpifpaf workhorse, rebuilt for TPU.

Reference parity: ``src/openpifpaf/network/basenetworks.py:~200``
(``ShuffleNetV2K``): a ShuffleNetV2 variant with 5x5 depthwise kernels, the
max-pool removed (total stride 16) and configurable normalization.  Variants:

- ``shufflenetv2k16``: stage repeats (4, 8, 4), channels (24, 348, 696, 1392, 1392)
- ``shufflenetv2k30``: stage repeats (8, 16, 6), channels (32, 512, 1024, 2048, 2048)
- ``shufflenetv2k44``: stage repeats (12, 24, 8), channels (32, 512, 1024, 2048, 2048)

TPU-first design notes: NHWC layout; depthwise convs use
``feature_group_count`` which XLA maps onto the VPU efficiently; the channel
shuffle is a reshape/transpose on the trailing (lane) axis that XLA fuses
into neighboring ops; compute dtype is bfloat16-capable with float32 params.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet


def channel_shuffle(x: jnp.ndarray, groups: int = 2) -> jnp.ndarray:
    """Interleave channel groups (NHWC, on the last axis).

    Matches torch ``channel_shuffle``: view C as (groups, C//groups) and
    transpose.
    """
    *lead, c = x.shape
    x = x.reshape(*lead, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(*lead, c)


class InvertedResidualK(nn.Module):
    """ShuffleNetV2 block with configurable (large) depthwise kernel.

    Reference: ``basenetworks.py`` ``InvertedResidualK``.
    """

    out_channels: int
    stride: int
    kernel_size: int = 5
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        branch_features = self.out_channels // 2
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        pad = self.kernel_size // 2

        if self.stride == 1:
            x1 = x[..., :x.shape[-1] // 2]
            x2 = x[..., x.shape[-1] // 2:]
        else:
            x1 = x
            x2 = x

        if self.stride > 1:
            # branch1: depthwise k×k stride s -> norm -> 1×1 -> norm -> relu
            b1 = nn.Conv(x1.shape[-1], (self.kernel_size, self.kernel_size),
                         strides=self.stride, padding=pad,
                         feature_group_count=x1.shape[-1],
                         name='branch1_dwconv', **kw)(x1)
            b1 = norm(self, 'branch1_dwnorm', b1, train)
            b1 = nn.Conv(branch_features, (1, 1), name='branch1_conv', **kw)(b1)
            b1 = norm(self, 'branch1_norm', b1, train)
            b1 = nn.relu(b1)
        else:
            b1 = x1

        # branch2: 1×1 -> norm -> relu -> depthwise k×k -> norm -> 1×1 -> norm -> relu
        b2 = nn.Conv(branch_features, (1, 1), name='branch2_conv1', **kw)(x2)
        b2 = norm(self, 'branch2_norm1', b2, train)
        b2 = nn.relu(b2)
        b2 = nn.Conv(branch_features, (self.kernel_size, self.kernel_size),
                     strides=self.stride, padding=pad,
                     feature_group_count=branch_features,
                     name='branch2_dwconv', **kw)(b2)
        b2 = norm(self, 'branch2_dwnorm', b2, train)
        b2 = nn.Conv(branch_features, (1, 1), name='branch2_conv2', **kw)(b2)
        b2 = norm(self, 'branch2_norm2', b2, train)
        b2 = nn.relu(b2)

        out = jnp.concatenate([b1, b2], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2K(nn.Module):
    """Full backbone: conv1 (stride 2) + 3 stages (stride 2 each) + conv5."""

    stages_repeats: Sequence[int]
    stages_out_channels: Sequence[int]
    kernel_size: int = 5
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = nn.Conv(self.stages_out_channels[0], (3, 3), strides=2, padding=1,
                    name='conv1', **kw)(x)
        x = norm(self, 'conv1_norm', x, train)
        x = nn.relu(x)

        for stage_i, (repeats, out_ch) in enumerate(
                zip(self.stages_repeats, self.stages_out_channels[1:4]), start=2):
            x = InvertedResidualK(out_ch, 2, self.kernel_size, self.norm,
                                  self.dtype, name=f'stage{stage_i}_0')(x, train)
            for block_i in range(1, repeats):
                x = InvertedResidualK(out_ch, 1, self.kernel_size, self.norm,
                                      self.dtype,
                                      name=f'stage{stage_i}_{block_i}')(x, train)

        x = nn.Conv(self.stages_out_channels[-1], (1, 1), name='conv5', **kw)(x)
        x = norm(self, 'conv5_norm', x, train)
        x = nn.relu(x)
        return x


def _make(repeats, channels):
    def factory(norm: str = 'batchnorm', dtype=jnp.float32, **kwargs):
        return ShuffleNetV2K(stages_repeats=repeats,
                             stages_out_channels=channels,
                             norm=norm, dtype=dtype, **kwargs)
    return factory


# Plain (torchvision-style) ShuffleNetV2: identical topology with 3x3
# depthwise kernels; openpifpaf drops torchvision's maxpool so the total
# stride is 16.  Reference: ``src/openpifpaf/network/basenetworks.py:~120``
# (``ShuffleNetV2``, registered as ``shufflenetv2x1`` / ``shufflenetv2x2``).
def _make_plain(repeats, channels):
    def factory(norm: str = 'batchnorm', dtype=jnp.float32, **kwargs):
        return ShuffleNetV2K(stages_repeats=repeats,
                             stages_out_channels=channels,
                             kernel_size=3,
                             norm=norm, dtype=dtype, **kwargs)
    return factory


register_basenet(BaseNetworkSpec(
    'shufflenetv2x1', _make_plain((4, 8, 4), (24, 116, 232, 464, 1024)),
    stride=16, out_features=1024))
register_basenet(BaseNetworkSpec(
    'shufflenetv2x2', _make_plain((4, 8, 4), (24, 244, 488, 976, 2048)),
    stride=16, out_features=2048))

register_basenet(BaseNetworkSpec(
    'shufflenetv2k16', _make((4, 8, 4), (24, 348, 696, 1392, 1392)),
    stride=16, out_features=1392))
register_basenet(BaseNetworkSpec(
    'shufflenetv2k30', _make((8, 16, 6), (32, 512, 1024, 2048, 2048)),
    stride=16, out_features=2048))
register_basenet(BaseNetworkSpec(
    'shufflenetv2k44', _make((12, 24, 8), (32, 512, 1024, 2048, 2048)),
    stride=16, out_features=2048))
