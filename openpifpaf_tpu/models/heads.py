"""Composite field head networks.

Reference parity: ``src/openpifpaf/network/heads.py:~200``
(``CompositeField4``): a single 1x1 conv produces
``n_fields * n_components`` channels (times ``upsample_stride**2`` when the
optional PixelShuffle upsampling is enabled); the output is viewed as
``(B, n_fields, n_components, H, W)``.  At inference, confidences get a
sigmoid and spreads/scales a softplus; offset regressions stay in
feature-cell units (the decoder converts to image coordinates).

TPU-first: the conv runs in NHWC (a 1x1 conv is a pure MXU matmul over the
channel axis); the reshape/transpose to the reference layout is fused by XLA
into consumers.
"""

from __future__ import annotations

from typing import NamedTuple

import einops
import flax.linen as nn
import jax
import jax.numpy as jnp

from .. import headmeta


class FieldComponents(NamedTuple):
    """Structured view of a composite field tensor (inference activations).

    Shapes (single image or batched with a leading B axis):
      - ``conf``: (..., F, H, W) in [0, 1]
      - ``vec``:  (..., F, V, 2, H, W) offsets in feature-cell units,
        relative to the cell's integer coordinates
      - ``spread``: (..., F, V, H, W) Laplace spread b > 0
      - ``scale``: (..., F, S, H, W) joint/instance scale in feature-cell units
    """

    conf: jnp.ndarray
    vec: jnp.ndarray
    spread: jnp.ndarray
    scale: jnp.ndarray


def split_fields(x: jnp.ndarray, meta: headmeta.Base,
                 activated: bool = False) -> FieldComponents:
    """Slice a packed ``(..., F, C, H, W)`` field tensor into components.

    When ``activated`` is False, applies the inference activations
    (sigmoid / softplus).  Mirrors the slicing in the reference
    ``CompositeField4.forward`` (``heads.py:~260``).
    """
    nc, nv, ns = meta.n_confidences, meta.n_vectors, meta.n_scales
    conf = x[..., 0:nc, :, :]
    vec = x[..., nc:nc + 2 * nv, :, :]
    spread = x[..., nc + 2 * nv:nc + 3 * nv, :, :]
    scale = x[..., nc + 3 * nv:nc + 3 * nv + ns, :, :]

    lead = vec.shape[:-3]
    h, w = vec.shape[-2:]
    vec = vec.reshape(*lead, nv, 2, h, w)

    if not activated:
        conf = jax.nn.sigmoid(conf)
        spread = jax.nn.softplus(spread) + 1e-4
        scale = jax.nn.softplus(scale)
    if nc == 1:
        conf = conf[..., 0, :, :]
    return FieldComponents(conf=conf, vec=vec, spread=spread, scale=scale)


class CompositeField4(nn.Module):
    """1x1-conv composite field head."""

    meta: headmeta.Base
    in_features: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """NHWC feature map -> packed field tensor (B, F, C, H, W), float32."""
        meta = self.meta
        u = meta.upsample_stride
        out_ch = meta.n_fields * meta.n_components * u * u

        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)

        x = nn.Conv(out_ch, (1, 1), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name='conv')(x)
        x = x.astype(jnp.float32)

        if u > 1:
            # PixelShuffle, matching torch channel ordering (c rh rw)
            x = einops.rearrange(
                x, 'b h w (c rh rw) -> b (h rh) (w rw) c', rh=u, rw=u)
            # the reference crops the upsample margin (heads.py:~250)
            cut = u // 2
            x = x[:, cut:x.shape[1] - cut + 1, cut:x.shape[2] - cut + 1, :]

        return einops.rearrange(x, 'b h w (f c) -> b f c h w',
                                f=meta.n_fields, c=meta.n_components)


HEADS = {
    headmeta.Cif: CompositeField4,
    headmeta.Caf: CompositeField4,
    headmeta.CifDet: CompositeField4,
    headmeta.Tcaf: CompositeField4,
}
