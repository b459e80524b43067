"""Seed selection: candidate starting keypoints for pose growth.

Reference parity: ``src/openpifpaf/csrc/src/decoder/utils/cif_seeds.cpp:~20``:
every CIF cell whose confidence — blended with the CifHr value at its
regressed target — exceeds ``seed_threshold`` becomes a candidate
``(v, field, x, y, scale)``; candidates are sorted descending by value.

TPU-first: the per-cell blend is a vectorized bilinear gather from the
CifHr grid; "sorted list" becomes a static-size ``top_k``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import gather_field_grouped, masked_top_k


@dataclasses.dataclass(frozen=True)
class SeedsConfig:
    threshold: float = 0.2       # reference CifSeeds::threshold
    min_conf: float = 0.1        # cell confidence gate (CifHr v_threshold)
    score_scale: float = 1.0
    cifhr_blend: float = 0.9     # v = blend*cifhr(target) + (1-blend)*conf
    max_seeds: int = 512         # static candidate budget
    # Keep only cells that are a local maximum of the blended value in a
    # 3x3 window of their field.  The reference keeps every cell and relies
    # on occupancy at consumption time (cifcaf.cpp:~140) to skip the
    # non-maxima; filtering up front keeps the static seed budget spent on
    # distinct keypoints instead of duplicates of the strongest ones.
    local_max: bool = True


class Seeds(NamedTuple):
    """Static-shape seed set (sorted descending by value)."""

    v: jnp.ndarray        # (S,)
    f: jnp.ndarray        # (S,) int32 field (keypoint type) index
    x: jnp.ndarray        # (S,) px
    y: jnp.ndarray        # (S,) px
    s: jnp.ndarray        # (S,) scale px
    valid: jnp.ndarray    # (S,) bool


def select(conf: jnp.ndarray, x_px: jnp.ndarray, y_px: jnp.ndarray,
           scale_px: jnp.ndarray, cifhr: jnp.ndarray, *,
           hr_spacing: float, config: SeedsConfig) -> Seeds:
    """conf/x_px/y_px/scale_px: (F, H, W); cifhr: (F, Hh, Wh)."""
    f, h, w = conf.shape
    hr_v = gather_field_grouped(cifhr, jnp.arange(f, dtype=jnp.int32),
                                x_px, y_px, hr_spacing)
    v = (config.cifhr_blend * hr_v
         + (1.0 - config.cifhr_blend) * conf) * config.score_scale

    mask = (v > config.threshold) & (conf > config.min_conf)
    if config.local_max:
        vmax = jax.lax.reduce_window(
            v, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
            padding='SAME')
        mask = mask & (v >= vmax)
    flat_v = v.reshape(-1)
    mask = mask.reshape(-1)
    vals, idx, valid = masked_top_k(flat_v, mask, config.max_seeds)
    # one packed gather for (x, y, s) — amortizes per-kernel fixed cost
    packed = jnp.stack([x_px, y_px, scale_px], axis=-1).reshape(-1, 3)
    packed_sel = packed[idx]
    return Seeds(
        v=jnp.where(valid, vals, 0.0),
        f=(idx // (h * w)).astype(jnp.int32),
        x=packed_sel[:, 0],
        y=packed_sel[:, 1],
        s=packed_sel[:, 2],
        valid=valid,
    )


def select_from_fields(components, cifhr, *, stride: int, hr_spacing: float,
                       config: SeedsConfig) -> Seeds:
    f, h, w = components.conf.shape
    jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x_px = (ii + components.vec[:, 0, 0]) * stride
    y_px = (jj + components.vec[:, 0, 1]) * stride
    scale_px = components.scale[:, 0] * stride
    return select(components.conf, x_px, y_px, scale_px, cifhr,
                  hr_spacing=hr_spacing, config=config)
