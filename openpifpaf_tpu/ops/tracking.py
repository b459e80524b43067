"""On-device temporal association: TCAF scoring and greedy track matching.

Reference parity: ``src/openpifpaf/decoder/tracking_pose.py:~30`` — the
reference associates per-frame CifCaf poses across a frame pair by walking
TCAF connections with the same CafScored machinery, then assigns track ids
greedily.  TPU-first redesign: candidate extraction is a masked ``top_k``
per keypoint type, the (prev-pose x curr-pose) association matrix is one
batched einsum-style reduction over candidates, and greedy id assignment is
a fixed-depth ``fori_loop`` over a static score matrix — the whole
association step is a single XLA program with no host round-trip.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .common import masked_top_k


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    score_th: float = 0.2          # min TCAF cell confidence
    max_candidates: int = 128      # static per-keypoint-type budget
    radius_factor: float = 1.0     # match radius = factor * joint scale
    min_radius_px: float = 4.0
    min_match_score: float = 0.05  # minimum association score to link tracks
    max_tracks: int = 96           # static track budget


class TcafCandidates(NamedTuple):
    """Per-keypoint-type temporal association candidates; all (K, C)."""

    score: jnp.ndarray
    x1: jnp.ndarray     # px, previous frame
    y1: jnp.ndarray
    x2: jnp.ndarray     # px, current frame
    y2: jnp.ndarray
    s: jnp.ndarray      # px, joint scale at candidate
    valid: jnp.ndarray
    n_dropped: jnp.ndarray


def tcaf_candidates(components, *, stride: int,
                    config: TrackingConfig) -> TcafCandidates:
    """Extract top-C temporal association candidates per keypoint type.

    :param components: TCAF FieldComponents — conf (K, H, W),
        vec (K, 2, 2, H, W) (vector 0: previous frame, vector 1: current),
        scale (K, 2, H, W), all in cell units.
    """
    k, h, w = components.conf.shape
    n = h * w
    jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    x1 = (ii + components.vec[:, 0, 0]) * stride
    y1 = (jj + components.vec[:, 0, 1]) * stride
    x2 = (ii + components.vec[:, 1, 0]) * stride
    y2 = (jj + components.vec[:, 1, 1]) * stride
    s = jnp.maximum(components.scale[:, 0], components.scale[:, 1]) * stride

    flat = components.conf.reshape(k, n)
    mask = flat > config.score_th
    vals, idx, valid = masked_top_k(flat, mask, config.max_candidates)
    take = jnp.take_along_axis
    dropped = jnp.maximum(0, mask.sum() - valid.sum()).astype(jnp.int32)
    return TcafCandidates(
        score=jnp.where(valid, vals, 0.0),
        x1=take(x1.reshape(k, n), idx, 1),
        y1=take(y1.reshape(k, n), idx, 1),
        x2=take(x2.reshape(k, n), idx, 1),
        y2=take(y2.reshape(k, n), idx, 1),
        s=take(s.reshape(k, n), idx, 1),
        valid=valid,
        n_dropped=dropped,
    )


def association_scores(cands: TcafCandidates,
                       prev_xyv: jnp.ndarray, prev_valid: jnp.ndarray,
                       curr_xyv: jnp.ndarray, curr_valid: jnp.ndarray,
                       config: TrackingConfig) -> jnp.ndarray:
    """Score every (previous pose, current pose) pair via TCAF candidates.

    :param prev_xyv: (P, K, 3) poses in the previous frame (px)
    :param curr_xyv: (Q, K, 3) poses in the current frame (px)
    :returns: (P, Q) association scores in [0, 1]

    A candidate supports pair (p, q) at keypoint type k when its frame-1
    endpoint lands near prev_xyv[p, k] and its frame-2 endpoint near
    curr_xyv[q, k]; per (pair, k) the best candidate counts, and scores
    average over the keypoint types visible in both poses.
    """
    radius = jnp.maximum(config.min_radius_px,
                         config.radius_factor * cands.s)      # (K, C)

    def near(px, py, cx, cy):
        # px/py (N, K); cx/cy (K, C) -> (N, K, C) inside-radius indicator
        d2 = ((px[:, :, None] - cx[None]) ** 2
              + (py[:, :, None] - cy[None]) ** 2)
        return d2 <= (radius[None] ** 2)

    prev_vis = prev_xyv[..., 2] > 0.0        # (P, K)
    curr_vis = curr_xyv[..., 2] > 0.0        # (Q, K)
    near1 = near(prev_xyv[..., 0], prev_xyv[..., 1],
                 cands.x1, cands.y1) & prev_vis[:, :, None]    # (P, K, C)
    near2 = near(curr_xyv[..., 0], curr_xyv[..., 1],
                 cands.x2, cands.y2) & curr_vis[:, :, None]    # (Q, K, C)

    sc = jnp.where(cands.valid, cands.score, 0.0)              # (K, C)
    # best supporting candidate per (p, q, k): max_c sc * near1 * near2
    per_k = jnp.max(
        sc[None, None] * near1[:, None] * near2[None], axis=-1)  # (P, Q, K)

    both_vis = prev_vis[:, None] & curr_vis[None]               # (P, Q, K)
    denom = jnp.maximum(1.0, jnp.sum(both_vis, axis=-1))
    scores = jnp.sum(per_k, axis=-1) / denom
    scores = scores * prev_valid[:, None] * curr_valid[None]
    return scores


def greedy_match(scores: jnp.ndarray, min_score: float) -> jnp.ndarray:
    """Greedy one-to-one assignment on a static (P, Q) score matrix.

    Returns (Q,) int32: for each current pose the matched previous pose
    index, or -1.  Mirrors the reference's score-ordered greedy id
    assignment as a fixed-depth loop (each iteration claims the global
    best remaining pair).
    """
    p, q = scores.shape
    n_rounds = min(p, q)
    neg = jnp.float32(-1.0)

    def body(_, state):
        s, match = state
        flat_idx = jnp.argmax(s)
        pi, qi = flat_idx // q, flat_idx % q
        best = s[pi, qi]
        ok = best >= min_score
        match = jnp.where(
            ok, match.at[qi].set(pi.astype(jnp.int32)), match)
        s = jnp.where(ok, s.at[pi, :].set(neg).at[:, qi].set(neg), s)
        return s, match

    _, match = jax.lax.fori_loop(
        0, n_rounds, body,
        (scores.astype(jnp.float32), jnp.full((q,), -1, jnp.int32)))
    return match


def make_associator(*, tcaf_meta, config: TrackingConfig):
    """Build a jitted ``associate(tcaf_field, prev_xyv, prev_valid,
    curr_xyv, curr_valid) -> (match (Q,), n_dropped ())`` closure.

    ``tcaf_field``: raw packed head output (K, 9, H, W).
    """
    from ..models.heads import split_fields  # circular-import guard

    stride = tcaf_meta.stride

    def associate(tcaf_field, prev_xyv, prev_valid, curr_xyv, curr_valid):
        components = split_fields(tcaf_field, tcaf_meta)
        cands = tcaf_candidates(components, stride=stride, config=config)
        scores = association_scores(cands, prev_xyv, prev_valid,
                                    curr_xyv, curr_valid, config)
        match = greedy_match(scores, config.min_match_score)
        return match, cands.n_dropped

    return jax.jit(associate)
