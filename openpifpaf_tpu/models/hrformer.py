"""HRFormer backbone: high-resolution multi-branch transformer.

Reference parity: ``src/openpifpaf/network/basenetworks.py`` lists HRFormer
as an optional backbone (wrapping the external HRFormer repo).  Rebuilt
here TPU-first as an HRNet-style multi-resolution trunk whose blocks are
local-window attention + depthwise-conv MLP (the HRFormer recipe, Yuan et
al. 2021):

- stem: two 3x3 stride-2 convs -> stride 4;
- stage 1: bottleneck conv blocks at stride 4;
- stages 2-4: parallel branches at strides (4, 8), (4, 8, 16),
  (4, 8, 16, 32); each module runs HRFormer blocks per branch then fuses
  across resolutions (strided 3x3 convs down, nearest-resize + 1x1 up);
- output: all branches brought to stride 16 and concatenated, so the trunk
  plugs into the standard stride-16 composite-field heads.

TPU-first notes: window partition is reshape/transpose only (reuses the
Swin helpers); attention is batched MXU matmuls; every resize is static;
the depthwise 3x3 in the MLP uses ``feature_group_count`` (VPU-friendly).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet
from .swin import WindowAttention, window_partition, window_reverse


class HRFormerBlock(nn.Module):
    """Local-window MHSA + depthwise-conv FFN, pre-norm residual."""

    dim: int
    num_heads: int
    window: int = 7
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        win = self.window

        shortcut = x
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm1')(x)
        pad_h = (win - h % win) % win
        pad_w = (win - w % win) % win
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        windows = window_partition(y, win)
        windows = WindowAttention(self.dim, self.num_heads, win,
                                  self.dtype, name='attn')(windows)
        y = window_reverse(windows, win, h + pad_h, w + pad_w)[:, :h, :w]
        x = shortcut + y

        # conv-MLP: 1x1 expand -> depthwise 3x3 -> 1x1 project
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm2')(x)
        y = nn.Conv(hidden, (1, 1), name='mlp_fc1', **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(hidden, (3, 3), padding=1, feature_group_count=hidden,
                    name='mlp_dwconv', **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), name='mlp_fc2', **kw)(y)
        return x + y


class Bottleneck(nn.Module):
    """HRNet stage-1 conv bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""

    out_channels: int
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        mid = self.out_channels // 4

        y = nn.Conv(mid, (1, 1), name='conv1', **kw)(x)
        y = nn.relu(norm(self, 'norm1', y, train))
        y = nn.Conv(mid, (3, 3), padding=1, name='conv2', **kw)(y)
        y = nn.relu(norm(self, 'norm2', y, train))
        y = nn.Conv(self.out_channels, (1, 1), name='conv3', **kw)(y)
        y = norm(self, 'norm3', y, train)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name='down', **kw)(x)
            x = norm(self, 'down_norm', x, train)
        return nn.relu(x + y)


class FuseLayer(nn.Module):
    """Cross-resolution fusion: every branch receives every other branch."""

    channels: Sequence[int]
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        outs = []
        for i, ci in enumerate(self.channels):
            acc = xs[i]
            for j, xj in enumerate(xs):
                if j == i:
                    continue
                y = xj
                if j < i:                      # downsample j -> i
                    for step in range(i - j):
                        last = step == i - j - 1
                        ch = ci if last else xj.shape[-1]
                        y = nn.Conv(ch, (3, 3), strides=2, padding=1,
                                    name=f'down{j}to{i}_{step}', **kw)(y)
                        y = norm(self, f'down{j}to{i}_{step}_norm', y, train)
                        if not last:
                            y = nn.relu(y)
                else:                          # upsample j -> i
                    y = nn.Conv(ci, (1, 1), name=f'up{j}to{i}', **kw)(y)
                    y = norm(self, f'up{j}to{i}_norm', y, train)
                    y = jax.image.resize(
                        y, (y.shape[0], acc.shape[1], acc.shape[2], ci),
                        method='nearest')
                acc = acc + y
            outs.append(nn.relu(acc))
        return outs


class HRFormer(nn.Module):
    """Multi-resolution transformer trunk; output at stride 16."""

    base_channels: int = 32
    num_heads: Sequence[int] = (1, 2, 4, 8)
    num_modules: Sequence[int] = (1, 3, 2)     # stages 2, 3, 4
    blocks_per_module: int = 2
    window: int = 7
    mlp_ratio: float = 4.0
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        c = self.base_channels
        x = x.astype(self.dtype)

        # stem: stride 4
        x = nn.Conv(64, (3, 3), strides=2, padding=1, name='stem1', **kw)(x)
        x = nn.relu(norm(self, 'stem1_norm', x, train))
        x = nn.Conv(64, (3, 3), strides=2, padding=1, name='stem2', **kw)(x)
        x = nn.relu(norm(self, 'stem2_norm', x, train))

        # stage 1: conv bottlenecks at stride 4
        for block_i in range(2):
            x = Bottleneck(256, self.norm, self.dtype,
                           name=f'stage1_block{block_i}')(x, train)

        branches = [x]
        for stage_i, n_modules in enumerate(self.num_modules, start=2):
            n_branches = stage_i
            chans = [c * (2 ** i) for i in range(n_branches)]
            # transition: project existing branches, create the new one
            new_branches = []
            for i, ch in enumerate(chans):
                if i < len(branches):
                    y = branches[i]
                    if y.shape[-1] != ch:
                        y = nn.Conv(ch, (3, 3), padding=1,
                                    name=f't{stage_i}_proj{i}', **kw)(y)
                        y = nn.relu(norm(self, f't{stage_i}_proj{i}_norm',
                                         y, train))
                else:
                    y = nn.Conv(ch, (3, 3), strides=2, padding=1,
                                name=f't{stage_i}_new{i}', **kw)(branches[-1])
                    y = nn.relu(norm(self, f't{stage_i}_new{i}_norm',
                                     y, train))
                new_branches.append(y)
            branches = new_branches

            for module_i in range(n_modules):
                branches = [
                    _run_blocks(branches[i], chans[i],
                                self.num_heads[i], stage_i, module_i, i,
                                self.blocks_per_module, self.window,
                                self.mlp_ratio, self.dtype, train)
                    for i in range(n_branches)]
                branches = FuseLayer(chans, self.norm, self.dtype,
                                     name=f's{stage_i}_m{module_i}_fuse')(
                                         branches, train)

        # gather to stride 16 (branch index 2) and concatenate
        target = branches[2]
        outs = []
        for i, y in enumerate(branches):
            if i < 2:       # higher-res: downsample with strided convs
                for step in range(2 - i):
                    ch = y.shape[-1] * 2
                    y = nn.Conv(ch, (3, 3), strides=2, padding=1,
                                name=f'out_down{i}_{step}', **kw)(y)
                    y = nn.relu(norm(self, f'out_down{i}_{step}_norm',
                                     y, train))
            elif i > 2:     # lower-res: nearest upsample
                y = jax.image.resize(
                    y, (y.shape[0], target.shape[1], target.shape[2],
                        y.shape[-1]), method='nearest')
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)


def _run_blocks(x, dim, heads, stage_i, module_i, branch_i,
                n_blocks, window, mlp_ratio, dtype, train):
    """Run this branch's HRFormer blocks (called inside HRFormer's compact
    scope, so submodules attach to the trunk automatically)."""
    for block_i in range(n_blocks):
        x = HRFormerBlock(
            dim, heads, window, mlp_ratio, dtype,
            name=f's{stage_i}_m{module_i}_b{branch_i}_blk{block_i}')(x, train)
    return x


def _make_hrformer(base_channels, num_heads, num_modules, blocks):
    def factory(norm: str = 'batchnorm', dtype=jnp.float32, **kwargs):
        return HRFormer(base_channels=base_channels, num_heads=num_heads,
                        num_modules=num_modules, blocks_per_module=blocks,
                        norm=norm, dtype=dtype, **kwargs)
    return factory


# out_features: stride-16 concat of (4*C down-scaled highest res doubled
# twice) = branches (C,2C,4C,8C) -> after gathering: (4C, 4C, 4C, 8C).
register_basenet(BaseNetworkSpec(
    'hrformer_s', _make_hrformer(32, (1, 2, 4, 8), (1, 3, 2), 2),
    stride=16, out_features=32 * 4 * 3 + 32 * 8))
register_basenet(BaseNetworkSpec(
    'hrformer_b', _make_hrformer(78, (2, 4, 8, 16), (1, 3, 2), 2),
    stride=16, out_features=78 * 4 * 3 + 78 * 8))
