"""XCiT backbones (cross-covariance attention).

Reference parity: ``src/openpifpaf/network/basenetworks.py:~750`` (``XCiT``)
— the reference vendors the facebookresearch XCiT implementation
(``src/openpifpaf/network/xcit.py``): a conv stem to stride 16, Fourier
positional encoding, then alternating XCA (channel-attention), LPI (local
patch interaction conv) and MLP sub-blocks at constant resolution, each
scaled by a LayerScale ``gamma``.  The classification tail (CLS token +
class-attention blocks) is dropped for dense prediction; checkpoints carry
those tensors and the converter skips them (``models/converter.py``).

TPU-first: XCA's attention matrix is (head_dim x head_dim) — independent of
image size — so the quadratic cost of token attention disappears and every
contraction is a dense MXU matmul.  The Fourier positional grid depends
only on the static feature-map shape, so it is computed host-side at trace
time and enters the program as a baked constant; only its 1x1 projection
is traced (and therefore exported to ONNX as a plain conv).

Upstream naming parity (for the checkpoint converter): norm slots follow
the reference ordering — ``norm1`` gates XCA, ``norm3`` gates LPI and
``norm2`` gates the MLP, matching ``blocks.N.norm{1,3,2}`` in reference
state dicts.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .base import BaseNetworkSpec, NormFactory, register_basenet


class ConvStem(nn.Module):
    """Four 3x3 stride-2 convs -> total stride 16.

    Reference ``ConvPatchEmbed`` (``xcit.py:~90``): Conv/BN pairs at
    ``patch_embed.proj.{0,2,4,6}`` with exact GELU between them.
    """

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


def _fourier_grid(h: int, w: int, hidden_dim: int,
                  temperature: float) -> np.ndarray:
    """(h, w, 2*hidden_dim) sin/cos positional grid, reference semantics.

    Reference ``PositionalEncodingFourier`` (``xcit.py:~40``): normalized
    cumulative row/col coordinates scaled to 2*pi, per-frequency division,
    sin on even and cos on odd channels interleaved pairwise, y-features
    concatenated before x-features.  Pure host-side numpy on the static
    trace-time shape.
    """
    scale = 2.0 * np.pi
    eps = 1e-6
    y_embed = (np.arange(1, h + 1, dtype=np.float64) / (h + eps) * scale)
    x_embed = (np.arange(1, w + 1, dtype=np.float64) / (w + eps) * scale)
    dim_t = temperature ** (
        2.0 * (np.arange(hidden_dim) // 2) / hidden_dim)

    def interleave(embed):                      # (n,) -> (n, hidden_dim)
        pos = embed[:, None] / dim_t
        out = np.empty_like(pos)
        out[:, 0::2] = np.sin(pos[:, 0::2])
        out[:, 1::2] = np.cos(pos[:, 1::2])
        return out

    pos_y = np.broadcast_to(interleave(y_embed)[:, None, :],
                            (h, w, hidden_dim))
    pos_x = np.broadcast_to(interleave(x_embed)[None, :, :],
                            (h, w, hidden_dim))
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


class PositionalEncodingFourier(nn.Module):
    """Fourier positional features + learned 1x1 projection.

    Reference ``xcit.py:~40`` (``pos_embeder.token_projection``).
    """

    dim: int
    hidden_dim: int = 32
    temperature: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        grid = _fourier_grid(h, w, self.hidden_dim, self.temperature)
        pos = jnp.asarray(grid, dtype=self.dtype)[None]     # (1, h, w, 64)
        return nn.Conv(self.dim, (1, 1), name='token_projection',
                       use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32)(pos)


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

        # F.normalize semantics (reference xcit.py:~150): clamp, not add
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True),
                            1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True),
                            1e-12)
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
    """XCA -> LPI -> MLP, each LayerScale-gated (reference ``XCABlock``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (B, H, W, C) feature map."""
        b, h, w, c = x.shape
        norm = NormFactory(self.norm)
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        tokens = x.reshape(b, h * w, c)

        def gamma(name):
            g = self.param(name, nn.initializers.ones, (self.dim,),
                           jnp.float32)
            return g.astype(self.dtype)

        # XCA (reference slot norm1 / gamma1)
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm1')(tokens)
        y = XCA(self.dim, self.num_heads, self.dtype, name='xca')(y)
        tokens = tokens + gamma('gamma1') * y

        # LPI (reference slot norm3 / gamma3): dwconv -> gelu -> bn -> dwconv
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm3')(tokens)
        y = y.reshape(b, h, w, c)
        y = nn.Conv(self.dim, (3, 3), padding=1,
                    feature_group_count=self.dim, name='lpi_conv1',
                    use_bias=True, **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = norm(self, 'lpi_bn', y, train)
        y = nn.Conv(self.dim, (3, 3), padding=1,
                    feature_group_count=self.dim, name='lpi_conv2',
                    use_bias=True, **kw)(y)
        tokens = tokens + gamma('gamma3') * y.reshape(b, h * w, c)

        # MLP (reference slot norm2 / gamma2)
        y = nn.LayerNorm(param_dtype=jnp.float32, name='norm2')(tokens)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1', **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name='mlp_fc2', **kw)(y)
        tokens = tokens + gamma('gamma2') * y
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
        _, h, w, _ = x.shape
        pos = PositionalEncodingFourier(self.embed_dim, dtype=self.dtype,
                                        name='pos_embed')(h, w)
        x = x + pos.astype(x.dtype)
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
