"""Keypoint NMS and pose scoring — vectorized occupancy suppression.

Reference parity: ``src/openpifpaf/csrc/src/decoder/utils/nms_keypoints.cpp``
(``:~20``): poses sorted by score; walking down, each joint claims an
occupancy cell (square scaled by its joint scale); joints landing on a cell
already claimed by a better pose are zeroed; poses falling below
``instance_threshold`` are dropped.

TPU-first: the sequential claim loop becomes iterative pairwise masking —
round 1 suppresses with every higher-ranked joint as a claimant, round 2
re-ranks with suppressed claimants removed.  Converges to the sequential
result for the non-pathological overlap patterns seen in practice, with a
fixed two-round depth.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    suppression_radius: float = 4.0   # px floor (occupancy min cell)
    scale_factor: float = 0.5         # radius = max(floor, f * joint scale)
    instance_threshold: float = 0.15  # reference NMSKeypoints/CifCaf
    keypoint_threshold: float = 0.15  # joints below are zeroed pre-scoring
    iterations: int = 2
    min_joints: int = 1
    # Whole-pose suppression: if at least this fraction of a pose's joints
    # is claimed by better poses, the pose is a duplicate and dies entirely.
    # This is the parallel-decode equivalent of the reference's seed-time
    # occupancy check (cifcaf.cpp:~140): a seed inside an already-claimed
    # region never grows a pose at all.
    dedup_fraction: float = 0.5


def pose_scores(joint_v: jnp.ndarray, score_weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted sorted-descending pose score (annotation.py:~90 semantics).

    joint_v: (P, K); score_weights: (K,) -> (P,)
    """
    v_sorted = -jnp.sort(-joint_v, axis=-1)
    w = score_weights / jnp.maximum(1e-8, score_weights.sum())
    return v_sorted @ w


def keypoint_nms(poses: jnp.ndarray, pose_valid: jnp.ndarray,
                 joint_scales: jnp.ndarray, score_weights: jnp.ndarray,
                 config: NMSConfig):
    """poses: (P, K, 4) [x, y, v, s]; joint_scales: (P, K) px.

    Returns (poses with suppressed joint v zeroed, scores (P,), valid (P,)).
    """
    p, k, _ = poses.shape
    x = poses[..., 0]
    y = poses[..., 1]
    v = jnp.where(poses[..., 2] >= config.keypoint_threshold,
                  poses[..., 2], 0.0)
    v = jnp.where(pose_valid[:, None], v, 0.0)

    radius = jnp.maximum(config.suppression_radius,
                         config.scale_factor * joint_scales)  # (P, K)

    # pairwise same-joint distances: (P, P, K)
    dx = x[:, None, :] - x[None, :, :]
    dy = y[:, None, :] - y[None, :, :]
    d2 = dx * dx + dy * dy
    rr = jnp.maximum(radius[:, None, :], radius[None, :, :])
    near = d2 < rr * rr

    n_before = jnp.sum(v > 0.0, axis=-1)
    idx = jnp.arange(p)
    for _ in range(config.iterations):
        scores = pose_scores(v, score_weights)
        # exact lexicographic priority (score desc, index asc): q beats p
        sq = scores[None, :]
        sp = scores[:, None]
        beats = (sq > sp) | ((sq == sp) & (idx[None, :] < idx[:, None]))
        claim = (v > 0.0)                                   # (P, K) claimants
        suppressed = jnp.any(near & beats[:, :, None] & claim[None, :, :],
                             axis=1)                        # (P, K)
        v = jnp.where(suppressed, 0.0, v)

    scores = pose_scores(v, score_weights)
    n_joints = jnp.sum(v > 0.0, axis=-1)
    claimed_frac = 1.0 - n_joints / jnp.maximum(1, n_before)
    valid = (pose_valid & (scores >= config.instance_threshold)
             & (n_joints >= config.min_joints)
             & (claimed_frac < config.dedup_fraction))

    out = poses.at[..., 2].set(v)
    return out, scores, valid
