"""CompositeLoss: slice a head tensor into components and apply the losses.

Reference parity: ``src/openpifpaf/network/losses/composite.py:~40`` —
slices the head output into confidence / vector / scale parts, masks by
target validity, returns per-component losses (confidence, regression,
scale).  The reference signals invalid cells with NaNs; here targets carry
explicit boolean masks (jit-friendly, no NaN propagation hazards).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp

from . import components
from .. import headmeta


@dataclasses.dataclass(frozen=True)
class CompositeLossConfig:
    bce: components.BceConfig = components.BceConfig()
    laplace: components.LaplaceConfig = components.LaplaceConfig()
    smooth_l1: components.SmoothL1Config = components.SmoothL1Config()
    scale: components.ScaleConfig = components.ScaleConfig()
    regression_loss: str = 'laplace'  # 'laplace' | 'smoothl1'
    # reference prescales confidence loss by 1/(total cells) per image and
    # regression losses by 1/(valid cells); we normalize by valid counts.


def _mean_where(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    total = jnp.sum(jnp.where(mask, values, 0.0))
    count = jnp.maximum(1.0, jnp.sum(mask))
    return total / count


class CompositeLoss:
    """Loss for one composite-field head.

    ``__call__(field, target)`` with field (B, F, C, H, W) raw head output
    and target dict of arrays (see encoder docs) returns a list of scalar
    losses ``[conf, reg, scale]``.
    """

    def __init__(self, meta: headmeta.Base,
                 config: CompositeLossConfig = CompositeLossConfig()):
        self.meta = meta
        self.config = config
        self.n_components = 3

    @property
    def field_names(self) -> List[str]:
        prefix = f'{self.meta.dataset}.{self.meta.name}'
        return [f'{prefix}.c', f'{prefix}.vec', f'{prefix}.scales']

    def __call__(self, field: jnp.ndarray, target: dict) -> List[jnp.ndarray]:
        meta = self.meta
        nc, nv, ns = meta.n_confidences, meta.n_vectors, meta.n_scales
        field = field.astype(jnp.float32)

        if target['conf'].ndim == field.ndim:
            # tracking: single-frame targets come as (B, 2, ...) frame pairs
            # while the head output interleaves frames in the batch (2B, ...)
            # (tracking_base.py); fold the pair axis into the batch.
            target = {k: v.reshape((-1,) + v.shape[2:])
                      for k, v in target.items()}

        conf_raw = field[:, :, 0, :, :] if nc == 1 \
            else field[:, :, 0:nc, :, :]
        vec_raw = field[:, :, nc:nc + 2 * nv, :, :]
        b, f, _, h, w = field.shape
        vec_raw = vec_raw.reshape(b, f, nv, 2, h, w)
        spread_raw = field[:, :, nc + 2 * nv:nc + 3 * nv, :, :]
        scale_raw = field[:, :, nc + 3 * nv:nc + 3 * nv + ns, :, :]

        conf_l = components.focal_bce(conf_raw, target['conf'],
                                      self.config.bce)
        conf_loss = _mean_where(conf_l, target['conf_mask'])

        if nv > 0:
            if self.config.regression_loss == 'smoothl1':
                vec_l = components.smooth_l1_regression(
                    jnp.moveaxis(vec_raw, 3, -1),        # (B,F,V,H,W,2)
                    jnp.moveaxis(target['vec'], 3, -1),
                    self.config.smooth_l1)
            else:
                vec_l = components.laplace_regression(
                    jnp.moveaxis(vec_raw, 3, -1),        # (B,F,V,H,W,2)
                    spread_raw, jnp.moveaxis(target['vec'], 3, -1),
                    self.config.laplace)
            reg_loss = _mean_where(vec_l, target['vec_mask'])
        else:
            reg_loss = jnp.zeros(())

        if ns > 0:
            scale_l = components.scale_loss(scale_raw, target['scale'],
                                            self.config.scale)
            scale_loss_ = _mean_where(scale_l, target['scale_mask'])
        else:
            scale_loss_ = jnp.zeros(())

        return [conf_loss, reg_loss, scale_loss_]
