"""Keypoint NMS and pose scoring — vectorized occupancy suppression.

Reference parity: ``src/openpifpaf/csrc/src/decoder/utils/nms_keypoints.cpp``
(``:~20``): poses sorted by score; walking down, each joint claims an
occupancy cell (square scaled by its joint scale); joints landing on a cell
already claimed by a better pose are zeroed; poses falling below
``instance_threshold`` are dropped.

TPU-first: the sequential claim loop becomes fixed-priority restart
rounds — each round recomputes every joint's suppression from the
*original* joint confidences with only the previous round's survivors as
claimants.  Pose ``i`` (in priority order) is provably correct after
round ``i``, so the early-exit ``while_loop`` converges to the exact
sequential result for every overlap pattern, including pathological
suppression chains (A kills B, so B's victims survive, recursively) —
see ``tests/test_nms_oracle.py``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    suppression_radius: float = 4.0   # px floor (occupancy min cell)
    scale_factor: float = 0.5         # radius = max(floor, f * joint scale)
    instance_threshold: float = 0.15  # reference NMSKeypoints/CifCaf
    keypoint_threshold: float = 0.15  # joints below are zeroed pre-scoring
    # max restart rounds; 0 = run to convergence (at most P rounds, with
    # the early-exit while_loop stopping as soon as a round is a no-op)
    iterations: int = 0
    min_joints: int = 1
    # Whole-pose suppression: if at least this fraction of a pose's joints
    # is claimed by better poses, the pose is a duplicate and dies entirely.
    # Superseded by the exact seed-claim suppression below (default off,
    # i.e. >= 1.0); kept as a knob for decoders without seed provenance.
    dedup_fraction: float = 1.0
    # Exact parallel equivalent of the reference's seed-time occupancy
    # check (cifcaf.cpp:~140 + occupancy.cpp:~15): in sequential decode a
    # seed is skipped when an earlier (stronger-seeded, fully grown) pose
    # already claimed the seed's field at its location.  Because placed
    # joints never move and poses grow independently of each other, the
    # exact sequential outcome is computable *after* parallel growth as a
    # fixpoint over the seed-order DAG — see :func:`seed_claim_suppression`.
    seed_suppression: bool = True
    occupancy_reduction: float = 2.0  # reference Occupancy grid reduction
    occupancy_min_scale: float = 4.0  # reference Occupancy minimum radius


def pose_scores(joint_v: jnp.ndarray, score_weights: jnp.ndarray) -> jnp.ndarray:
    """Weighted sorted-descending pose score (annotation.py:~90 semantics).

    joint_v: (P, K); score_weights: (K,) -> (P,)
    """
    v_sorted = -jnp.sort(-joint_v, axis=-1)
    w = score_weights / jnp.maximum(1e-8, score_weights.sum())
    return v_sorted @ w


def seed_claim_suppression(poses: jnp.ndarray, placed: jnp.ndarray,
                           pose_valid: jnp.ndarray, seed_f: jnp.ndarray, *,
                           image_hw, config: NMSConfig,
                           rank: jnp.ndarray = None) -> jnp.ndarray:
    """Exact seed-time occupancy suppression, computed post-growth.

    Reference semantics (``cifcaf.cpp:~140``): seeds are consumed in
    descending score order; a seed of field ``f`` at ``(x, y)`` is skipped
    when the occupancy grid — a per-field byte grid at ``reduction``
    resolution where every *previously grown* pose claimed a
    ``max(min_scale, joint_scale)``-sized square around each placed joint
    (``occupancy.cpp:~15``) — is set at ``(f, x, y)``.  Sequential decode
    fully grows pose ``i`` before seed ``i+1`` is tested, and growth of a
    pose depends only on its own seed, so suppression is decidable from
    the *final* grown poses: ``alive(p) = valid(p) and no earlier alive
    pose q claimed field(p) at seed(p)`` — a fixpoint over the strict
    seed-order DAG, solved here by restart rounds (provably convergent,
    same argument as :func:`keypoint_nms`).

    The quantized geometry (grid rounding, clipping) mirrors the oracle
    ``Occupancy`` bit for bit so the drift harness measures scheduling
    only.  ``poses`` slots must be in seed consumption order (descending
    seed value — ``growth.init_poses`` guarantees this).

    :param seed_f: (P,) int32 seed keypoint field per pose slot
        (out-of-range for invalid slots).
    :param rank: (P,) optional seed consumption rank per slot; defaults to
        the slot index.  The r5 wave-recycled growth (``growth.grow_waves``)
        re-uses freed slots for later seeds, so consumption order is no
        longer the slot order and must be passed explicitly.
    :returns: (P,) bool — True where the pose survives.
    """
    p, k = placed.shape
    red = config.occupancy_reduction
    gh = int(np.ceil(image_hw[0] / red)) + 1
    gw = int(np.ceil(image_hw[1] / red)) + 1

    rows = jnp.arange(p)
    sf = jnp.clip(seed_f, 0, k - 1)
    # seed positions: the seed joint never moves during growth
    sx = poses[rows, sf, 0]
    sy = poses[rows, sf, 1]
    # query cell of each seed (oracle Occupancy.get quantization)
    qx = jnp.clip(jnp.round(sx / red), 0, gw - 1)
    qy = jnp.clip(jnp.round(sy / red), 0, gh - 1)

    # claimant geometry: pose q's joint of field sf[p] -> (Pq, Pp)
    cx = poses[:, sf, 0]
    cy = poses[:, sf, 1]
    cs = poses[:, sf, 3]
    c_placed = placed[:, sf]
    r = jnp.maximum(config.occupancy_min_scale, cs) / red
    xg = cx / red
    yg = cy / red
    x0 = jnp.clip(jnp.round(xg - r), 0, gw - 1)
    x1 = jnp.clip(jnp.round(xg + r), 0, gw - 1)
    y0 = jnp.clip(jnp.round(yg - r), 0, gh - 1)
    y1 = jnp.clip(jnp.round(yg + r), 0, gh - 1)
    inside = ((x0 <= qx[None, :]) & (qx[None, :] <= x1)
              & (y0 <= qy[None, :]) & (qy[None, :] <= y1))
    order = rows if rank is None else rank
    earlier = order[:, None] < order[None, :]
    claims = (inside & c_placed & earlier
              & pose_valid[:, None] & pose_valid[None, :])   # (q, p)

    def cond(state):
        i, _, converged = state
        return (i < p) & ~converged

    def body(state):
        i, alive, _ = state
        new = pose_valid & ~jnp.any(claims & alive[:, None], axis=0)
        return i + 1, new, jnp.all(new == alive)

    _, alive, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), pose_valid,
                     jnp.zeros((), bool)))
    return alive


def points_claimed(poses: jnp.ndarray, placed: jnp.ndarray,
                   pose_alive: jnp.ndarray, f: jnp.ndarray, x: jnp.ndarray,
                   y: jnp.ndarray, *, image_hw,
                   config: NMSConfig) -> jnp.ndarray:
    """Occupancy query of (f, x, y) points against alive grown poses.

    The oracle ``Occupancy.get`` (``occupancy.cpp:~15``) evaluated in
    parallel: point ``i`` is claimed when any alive pose's *placed* joint
    of field ``f[i]`` covers the point's quantized grid cell with its
    ``max(min_scale, joint_scale)`` square.  Quantization mirrors
    :func:`seed_claim_suppression` bit for bit (same oracle geometry).

    poses: (P, K, 4); placed: (P, K); pose_alive: (P,);
    f/x/y: (N,) query points.  Returns (N,) bool.
    """
    red = config.occupancy_reduction
    gh = int(np.ceil(image_hw[0] / red)) + 1
    gw = int(np.ceil(image_hw[1] / red)) + 1
    k = placed.shape[1]
    fq = jnp.clip(f, 0, k - 1)

    qx = jnp.clip(jnp.round(x / red), 0, gw - 1)            # (N,)
    qy = jnp.clip(jnp.round(y / red), 0, gh - 1)

    cx = poses[:, fq, 0]                                    # (P, N)
    cy = poses[:, fq, 1]
    cs = poses[:, fq, 3]
    c_placed = placed[:, fq]
    r = jnp.maximum(config.occupancy_min_scale, cs) / red
    xg = cx / red
    yg = cy / red
    x0 = jnp.clip(jnp.round(xg - r), 0, gw - 1)
    x1 = jnp.clip(jnp.round(xg + r), 0, gw - 1)
    y0 = jnp.clip(jnp.round(yg - r), 0, gh - 1)
    y1 = jnp.clip(jnp.round(yg + r), 0, gh - 1)
    inside = ((x0 <= qx[None, :]) & (qx[None, :] <= x1)
              & (y0 <= qy[None, :]) & (qy[None, :] <= y1))
    return jnp.any(inside & c_placed & pose_alive[:, None], axis=0)


def keypoint_nms(poses: jnp.ndarray, pose_valid: jnp.ndarray,
                 joint_scales: jnp.ndarray, score_weights: jnp.ndarray,
                 config: NMSConfig):
    """poses: (P, K, 4) [x, y, v, s]; joint_scales: (P, K) px.

    Returns (poses with suppressed joint v zeroed, scores (P,), valid (P,)).
    """
    p, k, _ = poses.shape
    x = poses[..., 0]
    y = poses[..., 1]
    v0 = jnp.where(poses[..., 2] >= config.keypoint_threshold,
                   poses[..., 2], 0.0)
    v0 = jnp.where(pose_valid[:, None], v0, 0.0)

    radius = jnp.maximum(config.suppression_radius,
                         config.scale_factor * joint_scales)  # (P, K)

    # pairwise same-joint distances: (P, P, K); suppression reach is the
    # CLAIMANT's radius (reference: occupancy.set uses the claiming
    # joint's sigma, nms_keypoints.cpp:~40; get is a point query)
    dx = x[:, None, :] - x[None, :, :]
    dy = y[:, None, :] - y[None, :, :]
    d2 = dx * dx + dy * dy
    rr = radius[None, :, :]
    near = d2 < rr * rr

    n_before = jnp.sum(v0 > 0.0, axis=-1)
    idx = jnp.arange(p)
    # fixed processing priority from the pre-NMS scores (the reference
    # sorts once up front): q beats p lexicographically
    scores0 = pose_scores(v0, score_weights)
    sq = scores0[None, :]
    sp = scores0[:, None]
    beats = (sq > sp) | ((sq == sp) & (idx[None, :] < idx[:, None]))

    def round_(v):
        claim = (v > 0.0)                                   # (P, K) claimants
        suppressed = jnp.any(near & beats[:, :, None] & claim[None, :, :],
                             axis=1)                        # (P, K)
        return jnp.where(suppressed, 0.0, v0)               # restart from v0

    max_rounds = config.iterations if config.iterations else p

    def cond(state):
        i, _, converged = state
        return (i < max_rounds) & ~converged

    def body(state):
        i, v, _ = state
        v_new = round_(v)
        return i + 1, v_new, jnp.all(v_new == v)

    _, v, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), v0, jnp.zeros((), bool)))

    scores = pose_scores(v, score_weights)
    n_joints = jnp.sum(v > 0.0, axis=-1)
    claimed_frac = 1.0 - n_joints / jnp.maximum(1, n_before)
    valid = (pose_valid & (scores >= config.instance_threshold)
             & (n_joints >= config.min_joints)
             & (claimed_frac < config.dedup_fraction))

    out = poses.at[..., 2].set(v)
    return out, scores, valid
