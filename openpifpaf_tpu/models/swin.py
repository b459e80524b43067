"""Swin Transformer backbones.

Reference parity: ``src/openpifpaf/network/basenetworks.py:~650`` (``Swin``)
— the reference wraps torchvision/timm Swin models for dense prediction.
Here the windowed attention stages are built directly; for the composite-
field heads the final patch merging is replaced with a channel projection so
the trunk's total stride stays 16 (strides 4 -> 8 -> 16 -> 16).

TPU-first: windows are extracted with reshape/transpose only (static
shapes, XLA-fusable); attention runs as batched MXU matmuls over
``(num_windows*B, heads, 49, head_dim)``; feature maps are padded to window
multiples and cropped back, so any input size compiles to one program.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .base import BaseNetworkSpec, register_basenet


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nH*nW, w*w, C); H, W must be multiples of w."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def window_reverse(windows: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    b = windows.shape[0] // ((h // w) * (ww // w))
    x = windows.reshape(b, h // w, ww // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, ww, -1)


def relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing='ij')).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]        # (2, w*w, w*w)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray = None) -> jnp.ndarray:
        """x: (nW*B, w*w, C); mask: (nW, w*w, w*w) additive or None."""
        n, l, c = x.shape
        head_dim = self.dim // self.num_heads
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)

        qkv = nn.Dense(3 * self.dim, name='qkv', **kw)(x)
        qkv = qkv.reshape(n, l, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        attn = jnp.einsum('nhld,nhmd->nhlm', q * (head_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)

        bias_table = self.param(
            'relative_position_bias_table',
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads), jnp.float32)
        idx = relative_position_index(self.window)
        bias = bias_table[idx.reshape(-1)].reshape(l, l, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(n // nw, nw, self.num_heads, l, l)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(n, self.num_heads, l, l)

        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum('nhlm,nhmd->nhld', attn.astype(self.dtype), v,
                       preferred_element_type=jnp.float32)
        y = y.transpose(0, 2, 1, 3).reshape(n, l, self.dim)
        return nn.Dense(self.dim, name='proj', **kw)(y.astype(self.dtype))


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        win = self.window

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name='norm1')(x)

        pad_h = (win - h % win) % win
        pad_w = (win - w % win) % win
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = self._attn_mask(hp, wp)
        else:
            mask = None

        windows = window_partition(x, win)
        windows = WindowAttention(self.dim, self.num_heads, win,
                                  self.dtype, name='attn')(windows, mask)
        x = window_reverse(windows, win, hp, wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = x[:, :h, :w]
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name='norm2')(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name='mlp_fc1', **kw)(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name='mlp_fc2', **kw)(y)
        return x + y

    def _attn_mask(self, hp: int, wp: int) -> jnp.ndarray:
        """Additive mask separating the rolled-together regions (static)."""
        win, shift = self.window, self.shift
        img_mask = np.zeros((hp, wp), np.int32)
        cnt = 0
        for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            for ws in (slice(0, -win), slice(-win, -shift),
                       slice(-shift, None)):
                img_mask[hs, ws] = cnt
                cnt += 1
        m = window_partition(jnp.asarray(img_mask[None, :, :, None],
                                         jnp.float32), win)[..., 0]
        diff = m[:, None, :] - m[:, :, None]
        return jnp.where(diff != 0.0, -100.0, 0.0)


class PatchMerging(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        pad_h, pad_w = h % 2, w % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name='norm')(x)
        return nn.Dense(self.out_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name='reduction')(x)


class Swin(nn.Module):
    """Swin trunk at total stride 16 (last stage is not downsampled)."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    norm: str = 'batchnorm'    # unused (transformer uses LayerNorm); kept
    dtype: jnp.dtype = jnp.float32  # for factory uniformity

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        x = nn.Conv(self.embed_dim, (4, 4), strides=4, name='patch_embed',
                    **kw)(x)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name='patch_norm')(x)

        for stage_i, (depth, heads) in enumerate(
                zip(self.depths, self.num_heads)):
            dim = self.embed_dim * (2 ** min(stage_i, 3))
            if stage_i > 0:
                if stage_i < 3:
                    x = PatchMerging(dim, self.dtype,
                                     name=f'merge{stage_i}')(x)
                else:
                    # keep stride 16: project channels without downsampling
                    x = nn.Dense(dim, use_bias=False,
                                 name=f'merge{stage_i}_proj', **kw)(x)
            for block_i in range(depth):
                x = SwinBlock(dim, heads, self.window,
                              shift=0 if block_i % 2 == 0 else self.window // 2,
                              dtype=self.dtype,
                              name=f'stage{stage_i}_block{block_i}')(x, train)
        x = nn.LayerNorm(epsilon=1e-5, param_dtype=jnp.float32, name='norm_out')(x)
        return x


def _make_swin(embed_dim, depths, num_heads):
    def factory(norm: str = 'batchnorm', dtype=jnp.float32, **kwargs):
        return Swin(embed_dim=embed_dim, depths=depths, num_heads=num_heads,
                    norm=norm, dtype=dtype, **kwargs)
    return factory


register_basenet(BaseNetworkSpec(
    'swin_t', _make_swin(96, (2, 2, 6, 2), (3, 6, 12, 24)),
    stride=16, out_features=768))
register_basenet(BaseNetworkSpec(
    'swin_s', _make_swin(96, (2, 2, 18, 2), (3, 6, 12, 24)),
    stride=16, out_features=768))
register_basenet(BaseNetworkSpec(
    'swin_b', _make_swin(128, (2, 2, 18, 2), (4, 8, 16, 32)),
    stride=16, out_features=1024))
