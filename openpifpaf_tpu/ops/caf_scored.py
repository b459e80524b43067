"""CAF candidate scoring: directed association candidates per skeleton edge.

Reference parity: ``src/openpifpaf/csrc/src/decoder/utils/caf_scored.cpp:~20``:
CAF cells above ``score_th`` (raw confidence — the threshold is applied
*before* rescoring) are rescored by blending with the CifHr value at their
*target* endpoint and stored twice — once per traversal direction — so
pose growth can walk an edge either way.

TPU-first: the per-direction "lists" become static-size top-C candidate
tensors ``(E, 2, C)``: one ``top_k`` on raw confidence per edge selects
the cells (shared by both directions, like the reference's dual insert),
then only those C cells are rescored with grouped MXU CifHr gathers.
C bounds the association work per growth round (the reference iterates
all cells; C=256 covers typical images — overflow is observable via
``n_dropped``, which counts cells above threshold that did not fit).
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

    # Filter on RAW confidence, then rescore only the survivors.  This is
    # the reference's order (``caf_scored.cpp:~30``: ``if (c < score_th)
    # continue;`` comes before the CifHr blend) and it shrinks the CifHr
    # rescoring gathers from all H*W cells to the C selected per edge.
    # Both traversal directions share the selected cells (the reference
    # stores each surviving cell in both directed lists).
    flat_conf = conf.reshape(e, n)
    mask = flat_conf > config.score_th
    c = config.max_candidates
    vals, idx, valid = masked_top_k(flat_conf, mask, c)    # (E, C)
    conf_sel = jnp.where(valid, vals, 0.0)
    n_dropped = jnp.maximum(0, mask.sum() - valid.sum()).astype(jnp.int32)

    # one packed gather for all six geometry components (six separate
    # take_along_axis calls become six tiny TPU kernels; one (E, N, 6)
    # gather amortizes the fixed per-kernel cost)
    packed = jnp.stack([x1, y1, x2, y2, s1, s2], axis=-1).reshape(e, n, 6)
    packed_sel = jnp.take_along_axis(packed, idx[..., None], axis=1)
    x1s, y1s, x2s, y2s, s1s, s2s = (packed_sel[..., i] for i in range(6))

    kp1 = jnp.asarray(skeleton[:, 0], jnp.int32)
    kp2 = jnp.asarray(skeleton[:, 1], jnp.int32)
    hr1 = gather_field_grouped(cifhr, kp1, x1s, y1s, hr_spacing)
    hr2 = gather_field_grouped(cifhr, kp2, x2s, y2s, hr_spacing)

    floor = config.cif_floor
    score_fwd = conf_sel * (floor + (1.0 - floor) * hr2)   # walk 1 -> 2
    score_bwd = conf_sel * (floor + (1.0 - floor) * hr1)   # walk 2 -> 1

    def stack(fwd, bwd):
        return jnp.stack([fwd, bwd], axis=1)               # (E, 2, C)

    return CafCandidates(
        score=stack(score_fwd, score_bwd),
        x_src=stack(x1s, x2s),
        y_src=stack(y1s, y2s),
        x_tgt=stack(x2s, x1s),
        y_tgt=stack(y2s, y1s),
        s_tgt=stack(s2s, s1s),
        valid=stack(valid, valid),
        n_dropped=n_dropped)
