"""CAF candidate scoring: directed association candidates per skeleton edge.

Reference parity: ``src/openpifpaf/csrc/src/decoder/utils/caf_scored.cpp:~20``:
CAF cells above ``score_th`` are rescored by blending with the CifHr value
at their *target* endpoint and stored twice — once per traversal direction —
so pose growth can walk an edge either way.

TPU-first: the per-direction "lists" become static-size top-C candidate
tensors ``(E, 2, C)`` selected with ``top_k``; rescoring is a batched
bilinear gather from CifHr.  C bounds the association work per growth round
(the reference iterates all cells; C=256 covers typical images — overflow
is observable via ``n_dropped``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .common import gather_field_grouped, masked_top_k


@dataclasses.dataclass(frozen=True)
class CafScoredConfig:
    score_th: float = 0.2        # reference CafScored::score_th
    cif_floor: float = 0.1       # rescore = c*(floor + (1-floor)*cifhr(tgt))
    max_candidates: int = 256    # static per-(edge, direction) budget


class CafCandidates(NamedTuple):
    """Directed candidates. All arrays (E, 2, C); direction 0 walks the
    skeleton edge from endpoint 1 to endpoint 2, direction 1 the reverse."""

    score: jnp.ndarray
    x_src: jnp.ndarray
    y_src: jnp.ndarray
    x_tgt: jnp.ndarray
    y_tgt: jnp.ndarray
    s_tgt: jnp.ndarray
    valid: jnp.ndarray
    n_dropped: jnp.ndarray  # () int32: candidates above th that didn't fit


def score(components, cifhr: jnp.ndarray, skeleton: np.ndarray, *,
          stride: int, hr_spacing: float,
          config: CafScoredConfig,
          confidence_scales: np.ndarray = None) -> CafCandidates:
    """Build directed association candidates for one image.

    :param components: CAF FieldComponents — conf (E, H, W),
        vec (E, 2, 2, H, W), scale (E, 2, H, W), cell units
    :param cifhr: (K, Hh, Wh) accumulated CIF confidences
    :param skeleton: (E, 2) 0-based keypoint indices per edge (static)
    """
    e, h, w = components.conf.shape
    n = h * w
    jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    conf = components.conf
    if confidence_scales is not None:
        conf = conf * jnp.asarray(confidence_scales, jnp.float32)[:, None, None]

    x1 = (ii + components.vec[:, 0, 0]) * stride   # (E, H, W) px
    y1 = (jj + components.vec[:, 0, 1]) * stride
    x2 = (ii + components.vec[:, 1, 0]) * stride
    y2 = (jj + components.vec[:, 1, 1]) * stride
    s1 = components.scale[:, 0] * stride
    s2 = components.scale[:, 1] * stride

    kp1 = jnp.asarray(skeleton[:, 0], jnp.int32)
    kp2 = jnp.asarray(skeleton[:, 1], jnp.int32)
    hr1 = gather_field_grouped(cifhr, kp1, x1, y1, hr_spacing)
    hr2 = gather_field_grouped(cifhr, kp2, x2, y2, hr_spacing)

    floor = config.cif_floor
    score_fwd = conf * (floor + (1.0 - floor) * hr2)   # walk 1 -> 2
    score_bwd = conf * (floor + (1.0 - floor) * hr1)   # walk 2 -> 1

    c = config.max_candidates

    def directed(sc, xs, ys, xt, yt, st):
        flat = sc.reshape(e, n)
        mask = flat > config.score_th
        vals, idx, valid = _vectorized_top_k(flat, mask, c)
        take = jnp.take_along_axis
        out = dict(
            score=jnp.where(valid, vals, 0.0),
            x_src=take(xs.reshape(e, n), idx, 1),
            y_src=take(ys.reshape(e, n), idx, 1),
            x_tgt=take(xt.reshape(e, n), idx, 1),
            y_tgt=take(yt.reshape(e, n), idx, 1),
            s_tgt=take(st.reshape(e, n), idx, 1),
            valid=valid,
        )
        dropped = jnp.maximum(0, mask.sum() - valid.sum())
        return out, dropped

    fwd, d1 = directed(score_fwd, x1, y1, x2, y2, s2)
    bwd, d2 = directed(score_bwd, x2, y2, x1, y1, s1)

    stacked = {k: jnp.stack([fwd[k], bwd[k]], axis=1) for k in fwd}
    return CafCandidates(n_dropped=(d1 + d2).astype(jnp.int32), **stacked)


def _vectorized_top_k(values: jnp.ndarray, mask: jnp.ndarray, k: int):
    from .common import masked_top_k
    return masked_top_k(values, mask, k)
