"""XCiT backbones (cross-covariance attention).

Reference parity: ``src/openpifpaf/network/basenetworks.py:~750`` (``XCiT``)
— cross-covariance image transformer for dense prediction: a conv stem to
stride 16, then alternating XCA (channel-attention) and LPI (local patch
interaction conv) blocks at constant resolution.  No CLS token (dense
features only).

TPU-first: XCA's attention matrix is (head_dim x head_dim) — independent of
image size — so the quadratic cost of token attention disappears and every
contraction is a dense MXU matmul.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet


class ConvStem(nn.Module):
    """Four 3x3 stride-2 convs -> total stride 16."""

    embed_dim: int
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        dims = (self.embed_dim // 8, self.embed_dim // 4,
                self.embed_dim // 2, self.embed_dim)
        for i, d in enumerate(dims):
            x = nn.Conv(d, (3, 3), strides=2, padding=1,
                        name=f'conv{i}', **kw)(x)
            x = norm(self, f'norm{i}', x, train)
            if i < len(dims) - 1:
                x = nn.gelu(x, approximate=False)
        return x


class XCA(nn.Module):
    """Cross-covariance attention over the channel dimension."""

    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, N, C) tokens."""
        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)

        qkv = nn.Dense(3 * self.dim, name='qkv', **kw)(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 3, 1) for i in range(3))
        # q, k, v: (B, heads, head_dim, N)

        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
        temperature = self.param('temperature', nn.initializers.ones,
                                 (self.num_heads, 1, 1), jnp.float32)
        attn = jnp.einsum('bhdn,bhen->bhde', q, k,
                          preferred_element_type=jnp.float32) * temperature
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum('bhde,bhen->bhdn', attn.astype(self.dtype), v,
                       preferred_element_type=jnp.float32)
        y = y.transpose(0, 3, 1, 2).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name='proj', **kw)(y.astype(self.dtype))


class XCiTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, H, W, C) feature map."""
        b, h, w, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        tokens = x.reshape(b, h * w, c)

        # XCA
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm1')(tokens)
        tokens = tokens + XCA(self.dim, self.num_heads, self.dtype,
                              name='xca')(y)

        # LPI: depthwise 3x3 conv interaction (needs the 2D layout)
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm2')(tokens)
        y = y.reshape(b, h, w, c)
        y = nn.Conv(self.dim, (3, 3), padding=1,
                    feature_group_count=self.dim, name='lpi_conv1',
                    use_bias=True, **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (3, 3), padding=1,
                    feature_group_count=self.dim, name='lpi_conv2',
                    use_bias=True, **kw)(y)
        tokens = tokens + y.reshape(b, h * w, c)

        # MLP
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm3')(tokens)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1', **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name='mlp_fc2', **kw)(y)
        tokens = tokens + y
        return tokens.reshape(b, h, w, c)


class XCiT(nn.Module):
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 8
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = ConvStem(self.embed_dim, self.norm, self.dtype,
                     name='stem')(x, train)
        for i in range(self.depth):
            x = XCiTBlock(self.embed_dim, self.num_heads, norm=self.norm,
                          dtype=self.dtype, name=f'block{i}')(x, train)
        return nn.LayerNorm(param_dtype=jnp.float32, name='norm_out')(x)


def _make_xcit(embed_dim, depth, num_heads):
    def factory(norm: str = 'batchnorm', dtype=jnp.float32, **kwargs):
        return XCiT(embed_dim=embed_dim, depth=depth, num_heads=num_heads,
                    norm=norm, dtype=dtype, **kwargs)
    return factory


register_basenet(BaseNetworkSpec(
    'xcit_small_12', _make_xcit(384, 12, 8),
    stride=16, out_features=384))
register_basenet(BaseNetworkSpec(
    'xcit_medium_24', _make_xcit(512, 24, 8),
    stride=16, out_features=512))
