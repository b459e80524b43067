"""SqueezeNet backbone.

Reference parity: ``src/openpifpaf/network/basenetworks.py:~480``
(``SqueezeNet``) — Fire modules; the reference modifies the torchvision
trunk so the pools give a total stride of 16.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .base import BaseNetworkSpec, NormFactory, register_basenet


class Fire(nn.Module):
    squeeze_channels: int
    expand1x1_channels: int
    expand3x3_channels: int
    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = NormFactory(self.norm)
        kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)
        s = nn.Conv(self.squeeze_channels, (1, 1), name='squeeze', **kw)(x)
        s = nn.relu(s)
        e1 = nn.relu(nn.Conv(self.expand1x1_channels, (1, 1),
                             name='expand1x1', **kw)(s))
        e3 = nn.relu(nn.Conv(self.expand3x3_channels, (3, 3), padding=1,
                             name='expand3x3', **kw)(s))
        out = jnp.concatenate([e1, e3], axis=-1)
        return norm(self, 'norm', out, train)


class SqueezeNet(nn.Module):
    """SqueezeNet 1.1 trunk at total stride 16 (pools at 2, 4, 8, 16)."""

    norm: str = 'batchnorm'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kw = dict(use_bias=True, dtype=self.dtype, param_dtype=jnp.float32)

        def pool(y):
            return nn.max_pool(y, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), strides=2, padding=1, name='conv1', **kw)(x)
        x = nn.relu(x)
        x = pool(x)
        x = Fire(16, 64, 64, self.norm, self.dtype, name='fire2')(x, train)
        x = Fire(16, 64, 64, self.norm, self.dtype, name='fire3')(x, train)
        x = pool(x)
        x = Fire(32, 128, 128, self.norm, self.dtype, name='fire4')(x, train)
        x = Fire(32, 128, 128, self.norm, self.dtype, name='fire5')(x, train)
        x = pool(x)
        x = Fire(48, 192, 192, self.norm, self.dtype, name='fire6')(x, train)
        x = Fire(48, 192, 192, self.norm, self.dtype, name='fire7')(x, train)
        x = Fire(64, 256, 256, self.norm, self.dtype, name='fire8')(x, train)
        x = Fire(64, 256, 256, self.norm, self.dtype, name='fire9')(x, train)
        return x


register_basenet(BaseNetworkSpec(
    'squeezenet',
    lambda norm='batchnorm', dtype=jnp.float32, **kw: SqueezeNet(
        norm=norm, dtype=dtype, **kw),
    stride=16, out_features=512))
