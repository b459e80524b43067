"""BotNet backbone: ResNet with self-attention in the last stage.

Reference parity: ``src/openpifpaf/network/basenetworks.py`` (``BotNet``)
— Bottleneck Transformer: the 3x3 convs of the final ResNet stage are
replaced with multi-head self-attention over the feature map, with 2D
relative position embeddings.

TPU-first: at stride 16 the attended token count is small (e.g. 41x41 for a
641px image), so full attention is a pair of MXU matmuls; the relative
position term uses the same einsum shapes.  Position embeddings live at a
fixed base resolution and are linearly resized to the feature map, so one
checkpoint serves any input size.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet
from .resnet import Bottleneck


class MHSA2D(nn.Module):
    """Multi-head self-attention over a 2D feature map with relative
    position embeddings (BoTNet's all2all attention)."""

    dim: int
    num_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        q = nn.Conv(self.dim, (1, 1), name='q', **kw)(x)
        k = nn.Conv(self.dim, (1, 1), name='k', **kw)(x)
        v = nn.Conv(self.dim, (1, 1), name='v', **kw)(x)

        def heads(t):
            return t.reshape(b, h * w, self.num_heads,
                             head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)

        # content-content
        logits = jnp.einsum('bhnd,bhmd->bhnm', q * (head_dim ** -0.5), k,
                            preferred_element_type=jnp.float32)

        # content-position with decomposed 2D embeddings, stored at a fixed
        # base resolution and resized to the feature map (keeps checkpoints
        # portable across input sizes)
        base = 32
        rel_h_base = self.param('rel_h', nn.initializers.normal(0.02),
                                (self.num_heads, head_dim, base), jnp.float32)
        rel_w_base = self.param('rel_w', nn.initializers.normal(0.02),
                                (self.num_heads, head_dim, base), jnp.float32)
        rel_h = jax.image.resize(rel_h_base,
                                 (self.num_heads, head_dim, h), 'linear')
        rel_w = jax.image.resize(rel_w_base,
                                 (self.num_heads, head_dim, w), 'linear')
        qh = q.reshape(b, self.num_heads, h, w, head_dim)
        # position logits: q . (emb_row + emb_col), broadcast over tokens
        ph = jnp.einsum('bhywd,hdY->bhywY', qh, rel_h,
                        preferred_element_type=jnp.float32)  # (b,h,y,x,Y)
        pw = jnp.einsum('bhywd,hdX->bhywX', qh, rel_w,
                        preferred_element_type=jnp.float32)  # (b,h,y,x,X)
        pos = (ph[..., :, None] + pw[..., None, :]).reshape(
            b, self.num_heads, h * w, h * w) * (head_dim ** -0.5)

        attn = nn.softmax(logits + pos, axis=-1)
        y = jnp.einsum('bhnm,bhmd->bhnd', attn.astype(self.dtype), v,
                       preferred_element_type=jnp.float32)
        y = y.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return y.astype(self.dtype)


class BotBlock(nn.Module):
    """Bottleneck block with MHSA instead of the 3x3 conv."""

    out_channels: int
    num_heads: int = 4
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
        y = MHSA2D(width, self.num_heads, self.dtype, name='mhsa')(y)
        y = norm(self, 'bn2', y, train)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (1, 1), name='conv3', **kw)(y)
        y = norm(self, 'bn3', y, train)

        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1),
                               name='downsample_conv', **kw)(x)
            residual = norm(self, 'downsample_bn', residual, train)
        return nn.relu(y + residual)


class BotNet(nn.Module):
    """ResNet-50 trunk with the last stage as BoT blocks (stride 16)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, name='conv1', **kw)(x)
        x = norm(self, 'bn1', x, train)
        x = nn.relu(x)

        channels = (256, 512, 1024)
        strides = (1, 2, 2)
        for stage_i, (n_blocks, ch, s) in enumerate(
                zip(self.layers[:3], channels, strides), start=1):
            x = Bottleneck(ch, s, 1, self.norm, self.dtype,
                           name=f'layer{stage_i}_0')(x, train)
            for block_i in range(1, n_blocks):
                x = Bottleneck(ch, 1, 1, self.norm, self.dtype,
                               name=f'layer{stage_i}_{block_i}')(x, train)

        # stage 4 entry: 2x2 average pool (BoTNet puts the stage's stride
        # in the attention branch via avg-pool) -> total stride 16
        x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding=((0, 1), (0, 1)))
        for block_i in range(self.layers[3]):
            x = BotBlock(2048, norm=self.norm, dtype=self.dtype,
                         name=f'layer4_{block_i}')(x, train)
        return x


register_basenet(BaseNetworkSpec(
    'botnet',
    lambda norm='batchnorm', dtype=jnp.float32, **kw: BotNet(
        norm=norm, dtype=dtype, **kw),
    stride=16, out_features=2048))
