"""Pose growth: data-parallel frontier relaxation.

Reference parity: ``src/openpifpaf/csrc/src/decoder/cifcaf.cpp`` — the
greedy ``_grow()`` (``:~220``): a priority queue of frontier connections;
repeatedly pop the best (placed joint -> missing neighbor), find the best
CAF association near the placed joint (Gaussian-weighted by distance,
top-two blend, reverse-match confirmation, ``:~300``), place the joint if
above threshold, push new frontier edges.

TPU-first redesign: all poses grow **simultaneously**.  Each round computes,
for every pose and every directed skeleton edge with exactly one placed
endpoint, the best association candidate; each pose then places its single
best frontier joint (equivalent to one priority-queue pop per pose).  K-1
fixed rounds bound the depth, so the whole decode is one jit-compiled
program with static shapes — no host round-trip, no queue.

Sequencing deviation from the reference (documented in SURVEY.md §7 "hard
parts"): the reference grows poses one seed at a time with a shared
occupancy map; here poses grow independently and duplicates are removed by
the vectorized keypoint NMS afterwards.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import nms as nms_mod
from .caf_scored import CafCandidates
from .seeds import Seeds


@dataclasses.dataclass(frozen=True)
class GrowthConfig:
    keypoint_threshold: float = 0.15      # reference CifCaf::keypoint_threshold
    keypoint_threshold_rel: float = 0.5   # relative to the source joint v
    filter_factor: float = 2.0            # candidate filter radius = f * sigma
    gauss_denom: float = 0.25             # w = exp(-0.5 d2 / (gd * sigma^2))
    blend_min: float = 0.01               # second candidate min score to blend
    min_xy_scale: float = 2.0             # floor for sigma, px
    reverse_match: bool = True
    connection_blend: bool = True         # --connection-method=blend|max
    max_poses: int = 96
    seed_dedup_radius: float = 4.0        # px floor for seed suppression
    seed_dedup_scale: float = 0.5         # radius = max(floor, f * seed scale)
    force_complete: bool = False          # relaxed second pass
    force_complete_threshold: float = 0.001
    # joints placed per pose per relaxation round.  1 == the reference's
    # priority-queue semantics (each pop sees all earlier placements).
    # m > 1 places the top-m frontier joints per round: placements within
    # one round don't see each other's new out-edges — a bounded
    # scheduling relaxation (quantify with tools/drift_report.py).
    # Measured on a v5e at the COCO bench shape: m=2 decodes ~7% SLOWER
    # than m=1 (2.49 vs 2.32 ms/img — the wider per-round fresh work and
    # top-k outweigh the round reduction), so the default stays at the
    # exact semantics; the knob exists for other skeleton topologies.
    placements_per_round: int = 1
    # r5 wave-recycled growth (:func:`grow_waves`): pose slots freed by the
    # exact seed-claim fixpoint are refilled with the next unclaimed seeds
    # in score order — the budget semantics of the sequential reference,
    # where a skipped (claimed) seed never consumes max_poses budget
    # (``cifcaf.cpp:~140``).  Bounds the number of refill waves; the loop
    # early-exits as soon as a wave seeds nothing (no free slots or no
    # eligible seeds), so extra waves only run under budget pressure.
    max_waves: int = 8
    # radius-based seed-vs-seed pre-dedup in the wave path.  The oracle has
    # no such rule — a seed is only ever skipped by the occupancy claim of
    # a GROWN pose — and the radius geometry differs from the occupancy
    # geometry, so the heuristic can kill a seed the oracle would grow
    # (measured: the one residual noisy-COCO disagreement of the r5 wave
    # decoder, DRIFT_noise.md).  Off = exact oracle semantics: duplicate
    # seeds cost pose slots only within a wave, and the claim fixpoint +
    # refill recycles them.  :func:`init_poses` (the legacy single-wave
    # path) always dedups — without slot recycling the budget needs it.
    seed_dedup: bool = False


class DirectedEdges(NamedTuple):
    """Static directed-edge tables derived from a skeleton. Q = 2E."""

    src_kp: np.ndarray   # (Q,) keypoint index of the placed (source) end
    tgt_kp: np.ndarray   # (Q,) keypoint index of the missing (target) end
    edge: np.ndarray     # (Q,) edge index e
    direction: np.ndarray  # (Q,) 0 = walk 1->2, 1 = walk 2->1


def directed_edges(skeleton: np.ndarray) -> DirectedEdges:
    """skeleton: (E, 2) 0-based. Directed index q = 2*e + d (so the reverse
    of q is q ^ 1)."""
    skeleton = np.asarray(skeleton, dtype=np.int32)
    e = skeleton.shape[0]
    src = np.empty(2 * e, np.int32)
    tgt = np.empty(2 * e, np.int32)
    edge = np.repeat(np.arange(e, dtype=np.int32), 2)
    direction = np.tile(np.array([0, 1], np.int32), e)
    src[0::2] = skeleton[:, 0]
    tgt[0::2] = skeleton[:, 1]
    src[1::2] = skeleton[:, 1]
    tgt[1::2] = skeleton[:, 0]
    return DirectedEdges(src, tgt, edge, direction)


def init_poses(seeds: Seeds, *, n_keypoints: int,
               config: GrowthConfig) -> Tuple[jnp.ndarray, jnp.ndarray,
                                              jnp.ndarray, jnp.ndarray,
                                              jnp.ndarray, jnp.ndarray]:
    """Seed dedup + pose initialization.

    Approximates the reference's occupancy check at seed consumption
    (``cifcaf.cpp:~140``): a seed is suppressed when a stronger seed of the
    same field lies within its dedup radius (the exact cross-pose part of
    that check runs post-growth, ``nms.seed_claim_suppression``).  Returns
    (poses (P,K,4) [x,y,v,scale], placed (P,K), pose_valid (P,), seed_v (P,),
    n_dropped () int32 — surviving seeds beyond the max_poses budget —
    and seed_f (P,) int32, each slot's seed keypoint field).  Slots are in
    seed consumption order (descending seed value).
    """
    s = seeds.v.shape[0]
    r = jnp.maximum(config.seed_dedup_radius,
                    config.seed_dedup_scale * seeds.s)  # (S,) radius of each seed
    dx = seeds.x[None, :] - seeds.x[:, None]
    dy = seeds.y[None, :] - seeds.y[:, None]
    d2 = dx * dx + dy * dy
    same_field = seeds.f[None, :] == seeds.f[:, None]
    # seeds are sorted descending by v: j suppresses i when j < i
    stronger = jnp.arange(s)[None, :] < jnp.arange(s)[:, None]
    rr = jnp.maximum(r[None, :], r[:, None])
    suppressed = jnp.any(
        same_field & stronger & (d2 < rr * rr)
        & seeds.valid[None, :], axis=1)
    keep = seeds.valid & ~suppressed

    # compact the kept seeds to the front, capped at max_poses
    order = jnp.argsort(jnp.where(keep, -seeds.v, jnp.inf))[:config.max_poses]
    p = config.max_poses
    k = n_keypoints
    sel_valid = keep[order]
    f = seeds.f[order]
    poses = jnp.zeros((p, k, 4), jnp.float32)
    rows = jnp.arange(p)
    poses = poses.at[rows, f, 0].set(jnp.where(sel_valid, seeds.x[order], 0.0))
    poses = poses.at[rows, f, 1].set(jnp.where(sel_valid, seeds.y[order], 0.0))
    poses = poses.at[rows, f, 2].set(jnp.where(sel_valid, seeds.v[order], 0.0))
    poses = poses.at[rows, f, 3].set(jnp.where(sel_valid, seeds.s[order], 0.0))
    placed = jnp.zeros((p, k), bool).at[rows, f].set(sel_valid)
    n_dropped = jnp.maximum(
        0, jnp.sum(keep, dtype=jnp.int32) - jnp.sum(sel_valid,
                                                    dtype=jnp.int32))
    return (poses, placed, sel_valid,
            jnp.where(sel_valid, seeds.v[order], 0.0), n_dropped,
            jnp.where(sel_valid, f, n_keypoints).astype(jnp.int32))


def _dirviews(cand: CafCandidates, edges: DirectedEdges):
    """Directed candidate tensors, each (Q, C)."""
    def dirview(a):
        return a[edges.edge, edges.direction]
    return (dirview(cand.score), dirview(cand.x_src), dirview(cand.y_src),
            dirview(cand.x_tgt), dirview(cand.y_tgt), dirview(cand.s_tgt),
            dirview(cand.valid))


def _weighted_best(qx, qy, sigma, cxs, cys, cxt, cyt, cst, cvalid, cscore,
                   config: GrowthConfig, blend: bool):
    """Gaussian-filtered best (and optional top-2 blend) association.

    qx, qy, sigma: (...,) query source position/scale; c*: (..., C)
    candidate geometry/scores aligned with the query's leading dims.
    Returns value, tx, ty, ts (all (...,)).
    """
    dx = cxs - qx[..., None]                   # (..., C)
    dy = cys - qy[..., None]
    d2 = dx * dx + dy * dy
    sig2 = (sigma * sigma)[..., None]
    w = jnp.exp(-0.5 * d2 / (config.gauss_denom * sig2))
    in_range = d2 <= (config.filter_factor ** 2) * sig2
    cs = jnp.where(in_range & cvalid, w * cscore, 0.0)

    i1 = jnp.argmax(cs, axis=-1)               # (...,)
    take = jnp.take_along_axis
    v1 = take(cs, i1[..., None], -1)[..., 0]
    t1x = take(jnp.broadcast_to(cxt, cs.shape), i1[..., None], -1)[..., 0]
    t1y = take(jnp.broadcast_to(cyt, cs.shape), i1[..., None], -1)[..., 0]
    t1s = take(jnp.broadcast_to(cst, cs.shape), i1[..., None], -1)[..., 0]
    if not blend:
        return v1, t1x, t1y, t1s

    c_range = jnp.arange(cs.shape[-1])
    cs2 = jnp.where(c_range == i1[..., None], 0.0, cs)
    i2 = jnp.argmax(cs2, axis=-1)
    v2 = take(cs2, i2[..., None], -1)[..., 0]
    t2x = take(jnp.broadcast_to(cxt, cs.shape), i2[..., None], -1)[..., 0]
    t2y = take(jnp.broadcast_to(cyt, cs.shape), i2[..., None], -1)[..., 0]
    t2s = take(jnp.broadcast_to(cst, cs.shape), i2[..., None], -1)[..., 0]

    dt2 = (t2x - t1x) ** 2 + (t2y - t1y) ** 2
    blendable = (v2 > config.blend_min) & (dt2 <= t1s * t1s)
    wsum = jnp.maximum(v1 + v2, 1e-8)
    bx = (v1 * t1x + v2 * t2x) / wsum
    by = (v1 * t1y + v2 * t2y) / wsum
    bs = (v1 * t1s + v2 * t2s) / wsum
    tx = jnp.where(blendable, bx, t1x)
    ty = jnp.where(blendable, by, t1y)
    ts = jnp.where(blendable, bs, t1s)
    value = jnp.where(blendable, 0.5 * (v1 + v2), v1)
    return value, tx, ty, ts


def _connection_values(poses, placed, pose_valid, cand: CafCandidates,
                       edges: DirectedEdges, config: GrowthConfig,
                       reverse_match: bool):
    """Best association per (pose, directed edge).

    Returns value (P,Q), target x/y/scale (P,Q), new joint score (P,Q).
    Mirrors ``grow_connection_blend`` + reverse match
    (``cifcaf.cpp:~220..~330``).
    """
    e2 = edges.src_kp.shape[0]
    c_score, c_xs, c_ys, c_xt, c_yt, c_st, c_valid = _dirviews(cand, edges)

    src = jnp.asarray(edges.src_kp)
    tgt = jnp.asarray(edges.tgt_kp)
    xs = poses[:, src, 0]                      # (P, Q)
    ys = poses[:, src, 1]
    vs = poses[:, src, 2]
    ss = jnp.maximum(poses[:, src, 3], config.min_xy_scale)
    active = placed[:, src] & ~placed[:, tgt] & pose_valid[:, None]

    value, tx, ty, ts = _weighted_best(
        xs, ys, ss, c_xs[None], c_ys[None], c_xt[None], c_yt[None],
        c_st[None], c_valid[None], c_score[None], config,
        config.connection_blend)

    if reverse_match:
        # walk back from the found target along the reversed directed edge
        # (q ^ 1) and require landing near the source joint
        rev = jnp.arange(e2) ^ 1
        sig_t = jnp.maximum(ts, config.min_xy_scale)
        rv, rx, ry, _ = _weighted_best(
            tx, ty, sig_t, c_xs[rev][None], c_ys[rev][None], c_xt[rev][None],
            c_yt[rev][None], c_st[rev][None], c_valid[rev][None],
            c_score[rev][None], config, blend=False)
        back2 = (rx - xs) ** 2 + (ry - ys) ** 2
        ok = (rv > 0.0) & (back2 <= (config.filter_factor ** 2) * ss * ss)
        value = jnp.where(ok, value, 0.0)

    value = jnp.where(active, value, 0.0)
    new_v = jnp.sqrt(value * vs)
    return value, tx, ty, ts, new_v


def out_edges_table(edges: DirectedEdges, n_keypoints: int) -> np.ndarray:
    """(K, D) directed-edge ids with ``src_kp == k``, padded with Q.

    D = max out-degree.  Static (numpy): the incremental growth rounds
    look up which connections become computable when a joint is placed.
    """
    q_n = edges.src_kp.shape[0]
    by_src = [[] for _ in range(n_keypoints)]
    for q, s in enumerate(edges.src_kp):
        by_src[int(s)].append(q)
    d = max(1, max(len(lst) for lst in by_src))
    table = np.full((n_keypoints, d), q_n, np.int32)
    for k, lst in enumerate(by_src):
        table[k, :len(lst)] = lst
    return table


def in_edges_table(edges: DirectedEdges, n_keypoints: int) -> np.ndarray:
    """(K, D) directed-edge ids with ``tgt_kp == k``, padded with Q,
    ascending q per row (preserves the lowest-q argmax tie-break).

    Static mirror of :func:`out_edges_table`: the per-round "best
    incoming connection per joint" reduction gathers (P, K, D) from the
    padded connection tables instead of materializing a (P, Q, K)
    one-hot — the difference between ~100 KB and ~13 MB per image per
    round at WholeBody scale (K=133, Q=258)."""
    q_n = edges.src_kp.shape[0]
    by_tgt = [[] for _ in range(n_keypoints)]
    for q, t in enumerate(edges.tgt_kp):
        by_tgt[int(t)].append(q)
    d = max(1, max(len(lst) for lst in by_tgt))
    table = np.full((n_keypoints, d), q_n, np.int32)
    for k, lst in enumerate(by_tgt):
        table[k, :len(lst)] = lst
    return table


def _connection_values_at(poses, placed, pose_valid, cand: CafCandidates,
                          edges: DirectedEdges, config: GrowthConfig,
                          reverse_match: bool, q_sel, q_valid):
    """:func:`_connection_values` restricted to directed edges ``q_sel``
    (P, D) per pose (padded entries masked by ``q_valid``) — the
    incremental-round path: only ~max-out-degree edges per pose need
    computing when one joint was just placed, a ~Q/D reduction of the
    (P, Q, C) work the full pass does.  Same math, bit-equal results.
    """
    q_n = edges.src_kp.shape[0]
    c_score, c_xs, c_ys, c_xt, c_yt, c_st, c_valid = _dirviews(cand, edges)
    q_safe = jnp.minimum(q_sel, q_n - 1)       # clamp the pad sentinel

    src = jnp.asarray(edges.src_kp)[q_safe]    # (P, D)
    tgt = jnp.asarray(edges.tgt_kp)[q_safe]
    take = jnp.take_along_axis
    xs = take(poses[..., 0], src, 1)
    ys = take(poses[..., 1], src, 1)
    vs = take(poses[..., 2], src, 1)
    ss = jnp.maximum(take(poses[..., 3], src, 1), config.min_xy_scale)
    active = (take(placed, src, 1) & ~take(placed, tgt, 1)
              & pose_valid[:, None] & q_valid)

    value, tx, ty, ts = _weighted_best(
        xs, ys, ss, c_xs[q_safe], c_ys[q_safe], c_xt[q_safe], c_yt[q_safe],
        c_st[q_safe], c_valid[q_safe], c_score[q_safe], config,
        config.connection_blend)

    if reverse_match:
        rev = jnp.minimum(q_safe ^ 1, q_n - 1)
        sig_t = jnp.maximum(ts, config.min_xy_scale)
        rv, rx, ry, _ = _weighted_best(
            tx, ty, sig_t, c_xs[rev], c_ys[rev], c_xt[rev], c_yt[rev],
            c_st[rev], c_valid[rev], c_score[rev], config, blend=False)
        back2 = (rx - xs) ** 2 + (ry - ys) ** 2
        ok = (rv > 0.0) & (back2 <= (config.filter_factor ** 2) * ss * ss)
        value = jnp.where(ok, value, 0.0)

    value = jnp.where(active, value, 0.0)
    new_v = jnp.sqrt(value * vs)
    return value, tx, ty, ts, new_v


def grow(poses: jnp.ndarray, placed: jnp.ndarray, pose_valid: jnp.ndarray,
         cand: CafCandidates, edges: DirectedEdges,
         config: GrowthConfig, *, keypoint_threshold: float = None,
         reverse_match: bool = None, n_rounds: int = None,
         force_cand: CafCandidates = None,
         fresh_onehot: jnp.ndarray = None):
    """Run frontier relaxation until all joints are placed or K-1 rounds.

    Each round every pose places its single best frontier joint — the
    vectorized equivalent of the reference's priority-queue pop.

    ``force_cand``, when given, is a *separately thresholded* candidate set
    used only by the relaxed force-complete second pass (reference
    ``cifcaf.cpp:~380`` rebuilds CafScored with the relaxed threshold for
    that pass only); the first pass always consumes ``cand`` built at the
    normal ``caf_score_th``.

    ``fresh_onehot`` (P, K), when given, marks the joints whose out-edge
    connections must be computed in the first round (defaults to
    ``placed``).  The wave-recycled driver (:func:`grow_waves`) passes the
    onehot of the *newly seeded* slots only: already-grown poses are at
    their growth fixed point — every frontier attempt they could make
    already failed — so their cached connection values stay zero and they
    are inert by construction, while the fresh slots grow exactly as a
    cold start.
    """
    p, k = poses.shape[0], poses.shape[1]
    kp_th = config.keypoint_threshold if keypoint_threshold is None \
        else keypoint_threshold
    rev = config.reverse_match if reverse_match is None else reverse_match
    rounds = (k - 1) if n_rounds is None else n_rounds
    tgt = jnp.asarray(edges.tgt_kp)
    src = jnp.asarray(edges.src_kp)
    q_n = edges.src_kp.shape[0]
    out_edges = jnp.asarray(out_edges_table(edges, k))   # (K, D), pad = Q
    in_edges = jnp.asarray(in_edges_table(edges, k))     # (K, Din), pad = Q
    rows_p = jnp.arange(p)[:, None]

    def make_body(threshold: float, rel: float, reverse: bool,
                  pass_cand: CafCandidates):
        """One relaxation-round body; the force-complete pass is the same
        body with a relaxed threshold, its own relaxed candidate set, no
        relative gate and no reverse match (reference cifcaf.cpp:~380).

        A (pose, edge) connection depends only on the source joint, which
        never moves once placed — so connections are computed exactly
        once, in the round after their source joint lands, and cached in
        (P, Q+1) tables (column Q is the pad spill).  Each round's fresh
        work is (P, D, C) with D = max out-degree, not (P, Q, C).
        """

        m = max(1, config.placements_per_round)

        def body(state):
            poses, placed, rounds_done, _, tables, last_onehot = state

            # connections that became computable: src placed last round
            # (up to m joints per pose)
            j_new = jnp.argsort(~last_onehot, axis=1,
                                stable=True)[:, :m]              # (P, m)
            new_ok = jnp.take_along_axis(last_onehot, j_new, 1)
            q_sel = out_edges[j_new].reshape(p, -1)              # (P, m*D)
            q_ok = (q_sel < q_n) & jnp.repeat(
                new_ok, out_edges.shape[1], axis=1)
            fresh = _connection_values_at(
                poses, placed, pose_valid, pass_cand, edges, config,
                reverse, q_sel, q_ok)
            q_scatter = jnp.where(q_ok, q_sel, q_n)              # pad spill
            tables = tuple(
                t.at[rows_p, q_scatter].set(f)
                for t, f in zip(tables, fresh))
            value, tx, ty, ts, new_v = tables          # (P, Q+1), pad col Q

            vs = poses[:, src, 2]
            active = (placed[:, src] & ~placed[:, tgt]
                      & pose_valid[:, None])
            ok = ((new_v[:, :q_n] > threshold)
                  & (new_v[:, :q_n] > rel * vs) & active)
            conn = jnp.where(ok, value[:, :q_n], 0.0)   # (P, Q)
            conn_pad = jnp.concatenate(
                [conn, jnp.zeros((p, 1), conn.dtype)], axis=1)

            # best incoming directed edge per joint via the static
            # in-edge table: (P, K, Din) gather instead of a (P, Q, K)
            # one-hot; rows ascend in q, so argmax keeps the lowest-q
            # tie-break of the one-hot formulation
            conn_kd = conn_pad[:, in_edges]                      # (P, K, Din)
            d_star = jnp.argmax(conn_kd, axis=-1)                # (P, K)
            best_v = jnp.max(conn_kd, axis=-1)                   # (P, K)
            best_q = in_edges[jnp.arange(k)[None, :], d_star]    # (P, K)

            take = jnp.take_along_axis
            jx = take(tx, best_q, 1)
            jy = take(ty, best_q, 1)
            js = take(ts, best_q, 1)
            jv = take(new_v, best_q, 1)

            # top-m placements per pose per round (m=1: the best frontier
            # joint, exactly one priority-queue pop per pose)
            star_v, j_star = jax.lax.top_k(best_v, m)            # (P, m)
            slot_ok = (star_v > 0.0) & pose_valid[:, None]
            j_safe = jnp.where(slot_ok, j_star, k)               # pad spill
            new_pose_data = jnp.stack([
                take(jx, j_star, 1), take(jy, j_star, 1),
                take(jv, j_star, 1), take(js, j_star, 1)],
                axis=-1)                                         # (P, m, 4)
            poses_pad = jnp.concatenate(
                [poses, jnp.zeros((p, 1, 4), poses.dtype)], axis=1)
            poses = poses_pad.at[rows_p, j_safe].set(
                new_pose_data)[:, :k]
            onehot = jnp.zeros((p, k + 1), bool).at[
                rows_p, j_safe].set(True)[:, :k]
            placed = placed | onehot
            do_place = jnp.any(slot_ok, axis=1)
            return (poses, placed, rounds_done + 1, jnp.any(do_place),
                    tables, onehot)

        return body

    # early exit: a round that places nothing is a fixed point, so the
    # K-1 worst-case depth only runs when poses actually keep growing
    def cond(state):
        return (state[2] < rounds) & state[3]

    def run(poses, placed, body, reverse: bool, pass_cand: CafCandidates,
            seed_incremental: bool):
        """``seed_incremental``: at first-pass start exactly one joint per
        pose is placed (the seed), so the only computable connections are
        its out-edges — start from an empty cache and let the first loop
        round compute them through the incremental (P, m*D, C) path
        instead of paying a full (P, Q, C) pass that masks ~Q/D of its
        work to zero (same math, bit-equal results; measured ~0.9 ms/img
        of the decode budget at the COCO bench shape).  The force-complete
        second pass starts from fully-grown poses and keeps the full-pass
        seeding."""
        if seed_incremental:
            tables = tuple(jnp.zeros((p, q_n + 1), jnp.float32)
                           for _ in range(5))
            new_onehot = placed if fresh_onehot is None else fresh_onehot
        else:
            full = _connection_values(poses, placed, pose_valid, pass_cand,
                                      edges, config, reverse)
            tables = tuple(
                jnp.concatenate([t, jnp.zeros((p, 1), t.dtype)], axis=1)
                for t in full)
            new_onehot = jnp.zeros((p, k), bool)
        out = jax.lax.while_loop(
            cond, body, (poses, placed, jnp.zeros((), jnp.int32),
                         jnp.ones((), bool), tables, new_onehot))
        return out[0], out[1]

    poses, placed = run(poses, placed,
                        make_body(kp_th, config.keypoint_threshold_rel,
                                  rev, cand), rev, cand,
                        seed_incremental=True)
    if config.force_complete:
        fc_cand = force_cand if force_cand is not None else cand
        poses, placed = run(poses, placed,
                            make_body(config.force_complete_threshold,
                                      0.0, False, fc_cand), False, fc_cand,
                            seed_incremental=False)
    return poses, placed


def compact_seeds(seeds: Seeds, config: GrowthConfig):
    """Radius dedup + compaction of the full seed list, in rank order.

    With ``config.seed_dedup`` (off by default — the wave path's claim
    fixpoint + slot recycling makes the heuristic unnecessary AND it can
    diverge from the oracle, see the GrowthConfig note): a seed is dropped
    when a stronger seed of the same field lies within the dedup radius.
    Returns ``(x, y, v, s, f, valid)`` each (S,), sorted descending by
    value — index == consumption rank (the raw seed list from
    ``seeds.select`` is already value-sorted).
    """
    if not config.seed_dedup:
        return (seeds.x, seeds.y,
                jnp.where(seeds.valid, seeds.v, 0.0), seeds.s,
                seeds.f.astype(jnp.int32), seeds.valid)
    s = seeds.v.shape[0]
    r = jnp.maximum(config.seed_dedup_radius,
                    config.seed_dedup_scale * seeds.s)
    dx = seeds.x[None, :] - seeds.x[:, None]
    dy = seeds.y[None, :] - seeds.y[:, None]
    d2 = dx * dx + dy * dy
    same_field = seeds.f[None, :] == seeds.f[:, None]
    stronger = jnp.arange(s)[None, :] < jnp.arange(s)[:, None]
    rr = jnp.maximum(r[None, :], r[:, None])
    suppressed = jnp.any(
        same_field & stronger & (d2 < rr * rr)
        & seeds.valid[None, :], axis=1)
    keep = seeds.valid & ~suppressed
    # compact kept seeds to the front, preserving descending-v order
    order = jnp.argsort(jnp.where(keep, -seeds.v, jnp.inf))
    return (seeds.x[order], seeds.y[order],
            jnp.where(keep[order], seeds.v[order], 0.0), seeds.s[order],
            seeds.f[order].astype(jnp.int32), keep[order])


def grow_waves(seeds: Seeds, cand: CafCandidates, edges: DirectedEdges, *,
               n_keypoints: int, image_hw, config: GrowthConfig,
               nms_config, force_cand: CafCandidates = None):
    """Wave-recycled growth: the reference's seed-budget semantics.

    The sequential reference (``cifcaf.cpp:~140``) skips occupancy-claimed
    seeds *for free* — only grown poses consume the ``max_poses`` budget.
    Single-wave parallel decode instead spends pose slots on duplicate
    seeds that the claim fixpoint later kills, so under budget pressure
    (dense scenes, 133-kp skeletons) it finds fewer poses than the oracle
    at equal budgets (the r4 wholebody drift deficit, DRIFT_wholebody.md).

    This driver restores the oracle semantics exactly: grow a wave, run
    the exact seed-claim fixpoint (``nms.seed_claim_suppression`` with
    explicit consumption ranks), then refill the freed slots with the next
    *unclaimed* seeds in rank order and grow only those (already-grown
    poses are inert — see :func:`grow`'s ``fresh_onehot``).  Claims only
    flow from earlier-rank alive poses to later seeds, consumption is in
    strictly increasing rank order, and claims are monotone across waves,
    so the wave decomposition reproduces the sequential outcome for every
    seed (the oracle tests each seed against exactly the alive poses of
    earlier rank).  The loop exits as soon as a wave seeds nothing, which
    on scenes without budget pressure is immediately after wave 1 — the
    exact-parity COCO regime pays one eligibility check, nothing more.

    Returns ``(poses, placed, alive, n_dropped, seed_f, seed_rank)``:
    ``alive`` already includes the seed-claim suppression (callers must
    not re-apply it), ``n_dropped`` counts eligible unclaimed seeds left
    unconsumed (budget/wave overflow), ``seed_rank`` is each slot's seed
    consumption rank.
    """
    sx, sy, sv, ss, sf, s_valid = compact_seeds(seeds, config)
    s = sx.shape[0]
    p = config.max_poses
    k = n_keypoints
    rows_p = jnp.arange(p)

    def eligibility(poses, placed, alive, consumed):
        claimed = nms_mod.points_claimed(
            poses, placed, alive, sf, sx, sy,
            image_hw=image_hw, config=nms_config)
        return s_valid & ~consumed & ~claimed

    def body(state):
        poses, placed, slot_rank, slot_f, slot_valid, alive, consumed, \
            wave, _ = state

        eligible = eligibility(poses, placed, alive, consumed)
        n_free = p - jnp.sum(alive, dtype=jnp.int32)
        chosen = eligible & (jnp.cumsum(eligible) <= n_free)
        n_new = jnp.sum(chosen, dtype=jnp.int32)

        free_slots = jnp.argsort(alive, stable=True)          # (P,) free first
        sel = jnp.argsort(~chosen, stable=True)[:p]           # (P,) chosen first
        assign = rows_p < n_new
        f_sel = jnp.clip(sf[sel], 0, k - 1)

        seed_rows = jnp.zeros((p, k, 4), jnp.float32).at[rows_p, f_sel].set(
            jnp.stack([sx[sel], sy[sel], sv[sel], ss[sel]], axis=-1))
        old_rows = poses[free_slots]
        poses = poses.at[free_slots].set(
            jnp.where(assign[:, None, None], seed_rows, old_rows))

        placed_rows = jnp.zeros((p, k), bool).at[rows_p, f_sel].set(True)
        placed = placed.at[free_slots].set(
            jnp.where(assign[:, None], placed_rows, placed[free_slots]))

        slot_rank = slot_rank.at[free_slots].set(
            jnp.where(assign, sel, slot_rank[free_slots]))
        slot_f = slot_f.at[free_slots].set(
            jnp.where(assign, f_sel, slot_f[free_slots]))
        slot_valid = slot_valid.at[free_slots].set(
            jnp.where(assign, True, slot_valid[free_slots]))
        consumed = consumed | chosen

        fresh = jnp.zeros((p, k), bool).at[free_slots, f_sel].set(assign)
        poses, placed = grow(poses, placed, slot_valid, cand, edges, config,
                             force_cand=force_cand, fresh_onehot=fresh)

        alive = nms_mod.seed_claim_suppression(
            poses, placed, slot_valid, slot_f, image_hw=image_hw,
            config=nms_config, rank=slot_rank)
        return (poses, placed, slot_rank, slot_f, slot_valid, alive,
                consumed, wave + 1, n_new > 0)

    def cond(state):
        wave, seeded = state[7], state[8]
        return seeded & (wave < config.max_waves)

    init = (jnp.zeros((p, k, 4), jnp.float32), jnp.zeros((p, k), bool),
            jnp.full((p,), s, jnp.int32), jnp.full((p,), k, jnp.int32),
            jnp.zeros((p,), bool), jnp.zeros((p,), bool),
            jnp.zeros((s,), bool), jnp.zeros((), jnp.int32),
            jnp.ones((), bool))
    poses, placed, slot_rank, slot_f, slot_valid, alive, consumed, _, _ = \
        jax.lax.while_loop(cond, body, init)

    n_dropped = jnp.sum(eligibility(poses, placed, alive, consumed),
                        dtype=jnp.int32)
    return poses, placed, alive, n_dropped, slot_f, slot_rank
