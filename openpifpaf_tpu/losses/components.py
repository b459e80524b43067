"""Loss components: focal BCE, Laplace regression NLL, log-scale L1.

Reference parity: ``src/openpifpaf/network/losses/components.py`` —
``Bce`` (``:~30``, focal-style BCE with background clamp), ``Laplace``
(``:~160``, regression NLL ``|d|/b + log 2b`` with soft-clamped b) and
``Scale`` (``:~220``, log-space L1).

All functions are pure jnp on raw (pre-activation) head outputs and return
per-element losses; masking/normalization happens in the composite loss.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BceConfig:
    focal_gamma: float = 1.0        # reference --focal-gamma default
    background_weight: float = 1.0  # weight of negative cells
    min_bce: float = 0.0            # soft threshold: ignore tiny losses
    clamp: float = 5.0              # logit clamp (background clamp analogue)


def focal_bce(logits: jnp.ndarray, targets: jnp.ndarray,
              config: BceConfig) -> jnp.ndarray:
    """Per-cell focal binary cross-entropy on logits; targets in {0, 1}."""
    x = jnp.clip(logits, -config.clamp, config.clamp)
    # numerically stable bce-with-logits
    bce = jnp.maximum(x, 0.0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if config.min_bce > 0.0:
        bce = jnp.maximum(0.0, bce - config.min_bce)
    if config.focal_gamma != 0.0:
        p = jax.nn.sigmoid(x)
        pt = p * targets + (1.0 - p) * (1.0 - targets)
        focal = (1.0 - pt) ** config.focal_gamma
        bce = focal * bce
    if config.background_weight != 1.0:
        weight = jnp.where(targets < 0.5, config.background_weight, 1.0)
        bce = bce * weight
    return bce


@dataclasses.dataclass(frozen=True)
class LaplaceConfig:
    b_min: float = 0.1   # lower bound on the predicted spread (cell units)
    norm_clip: float = 0.0  # optional clipping of the distance (0 = off)


def laplace_regression(vec_raw: jnp.ndarray, spread_raw: jnp.ndarray,
                       vec_target: jnp.ndarray,
                       config: LaplaceConfig) -> jnp.ndarray:
    """Laplace NLL for offset regression.

    vec_raw, vec_target: (..., 2); spread_raw: (...,)
    loss = |d| / b + log(2 b), with b = softplus(raw) + b_min.
    """
    b = jax.nn.softplus(spread_raw) + config.b_min
    d = vec_raw - vec_target
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-8)
    if config.norm_clip > 0.0:
        norm = jnp.minimum(norm, config.norm_clip)
    return norm / b + jnp.log(2.0 * b)


@dataclasses.dataclass(frozen=True)
class SmoothL1Config:
    r_smooth: float = 0.0   # quadratic-to-linear transition radius (cells)


def smooth_l1_regression(vec_raw: jnp.ndarray,
                         vec_target: jnp.ndarray,
                         config: SmoothL1Config) -> jnp.ndarray:
    """Smooth-L1 (Huber) offset regression, the reference's alternative to
    Laplace NLL (``components.py:~120``, ``--regression-loss smoothl1``).

    vec_raw, vec_target: (..., 2).  Below ``r_smooth`` the loss is
    quadratic, above it linear; r_smooth == 0 degenerates to plain L1.
    """
    d = vec_raw - vec_target
    norm = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-8)
    r = config.r_smooth
    if r <= 0.0:
        return norm
    return jnp.where(norm < r,
                     0.5 / r * norm ** 2,
                     norm - 0.5 * r)


@dataclasses.dataclass(frozen=True)
class ScaleConfig:
    log_space: bool = True
    b: float = 1.0


def scale_loss(scale_raw: jnp.ndarray, scale_target: jnp.ndarray,
               config: ScaleConfig) -> jnp.ndarray:
    """L1 between predicted (softplus) and target scales, in log space."""
    s = jax.nn.softplus(scale_raw) + 1e-4
    t = jnp.maximum(scale_target, 1e-4)
    if config.log_space:
        return jnp.abs(jnp.log(s) - jnp.log(t)) / config.b
    return jnp.abs(s - t) / config.b
