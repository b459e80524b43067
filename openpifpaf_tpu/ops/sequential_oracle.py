"""Sequential-faithful decode oracle (host-side numpy, not jitted).

Reference parity: ``src/openpifpaf/csrc/src/decoder/cifcaf.cpp:~140`` — the
seed loop with occupancy suppression and the priority-queue ``_grow()``
(``:~220``).  The production decoder (``ops/growth.py``) replaces this
sequential scheduling with fixed-depth data-parallel frontier relaxation;
this module keeps the reference's *scheduling* semantics — seeds consumed
in score order, an occupancy grid claimed pose by pose, one joint placed
at a time per pose — while sharing the exact per-connection math with
``growth._connection_values``.  Purpose (SURVEY.md §7 "hard parts"): a slow
oracle to debug/bound the parallel decoder's scheduling deviation; tests
compare both on synthetic fields.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from .growth import GrowthConfig, directed_edges
from .nms import NMSConfig
from .seeds import Seeds
from .caf_scored import CafCandidates


class Occupancy:
    """Per-field byte grid at reduced resolution.

    Reference: ``csrc/src/decoder/utils/occupancy.cpp:~15`` —
    ``set(f, x, y, sigma)`` claims a sigma-scaled square, ``get`` queries.
    """

    def __init__(self, n_fields: int, hw, *, reduction: float = 2.0,
                 min_scale: float = 4.0):
        self.reduction = reduction
        self.min_scale = min_scale
        h = int(np.ceil(hw[0] / reduction)) + 1
        w = int(np.ceil(hw[1] / reduction)) + 1
        self.grid = np.zeros((n_fields, h, w), bool)

    def set(self, f: int, x: float, y: float, sigma: float) -> None:
        r = max(self.min_scale, sigma) / self.reduction
        xg, yg = x / self.reduction, y / self.reduction
        _, h, w = self.grid.shape
        x0 = int(np.clip(round(xg - r), 0, w - 1))
        x1 = int(np.clip(round(xg + r), 0, w - 1))
        y0 = int(np.clip(round(yg - r), 0, h - 1))
        y1 = int(np.clip(round(yg + r), 0, h - 1))
        self.grid[f, y0:y1 + 1, x0:x1 + 1] = True

    def get(self, f: int, x: float, y: float) -> bool:
        _, h, w = self.grid.shape
        xg = int(np.clip(round(x / self.reduction), 0, w - 1))
        yg = int(np.clip(round(y / self.reduction), 0, h - 1))
        return bool(self.grid[f, yg, xg])


def _best_connection(q: int, x: float, y: float, sigma: float,
                     cand: CafCandidates, edges, config: GrowthConfig,
                     blend: bool):
    """Scalar twin of ``growth._connection_values``'s weighted_best."""
    e, d = edges.edge[q], edges.direction[q]
    score = cand.score[e, d]
    valid = cand.valid[e, d]
    cxs = cand.x_src[e, d]
    cys = cand.y_src[e, d]
    cxt = cand.x_tgt[e, d]
    cyt = cand.y_tgt[e, d]
    cst = cand.s_tgt[e, d]

    d2 = (cxs - x) ** 2 + (cys - y) ** 2
    sig2 = sigma * sigma
    w = np.exp(-0.5 * d2 / (config.gauss_denom * sig2))
    in_range = d2 <= (config.filter_factor ** 2) * sig2
    cs = np.where(in_range & valid, w * score, 0.0)

    i1 = int(np.argmax(cs))
    v1 = float(cs[i1])
    t1 = (float(cxt[i1]), float(cyt[i1]), float(cst[i1]))
    if not blend:
        return v1, t1

    cs2 = cs.copy()
    cs2[i1] = 0.0
    i2 = int(np.argmax(cs2))
    v2 = float(cs2[i2])
    dt2 = (cxt[i2] - t1[0]) ** 2 + (cyt[i2] - t1[1]) ** 2
    if v2 > config.blend_min and dt2 <= t1[2] ** 2:
        wsum = max(v1 + v2, 1e-8)
        tx = (v1 * t1[0] + v2 * float(cxt[i2])) / wsum
        ty = (v1 * t1[1] + v2 * float(cyt[i2])) / wsum
        ts = (v1 * t1[2] + v2 * float(cst[i2])) / wsum
        return 0.5 * (v1 + v2), (tx, ty, ts)
    return v1, t1


def _grow_pose(pose: np.ndarray, placed: np.ndarray, cand: CafCandidates,
               edges, config: GrowthConfig, keypoint_threshold: float,
               reverse_match: bool) -> None:
    """Grow one pose to completion, best frontier connection first."""
    q_n = len(edges.src_kp)
    while True:
        best = (0.0, None)
        for q in range(q_n):
            s_kp, t_kp = int(edges.src_kp[q]), int(edges.tgt_kp[q])
            if not placed[s_kp] or placed[t_kp]:
                continue
            x, y, vs, ss = pose[s_kp]
            sigma = max(ss, config.min_xy_scale)
            value, tgt = _best_connection(q, x, y, sigma, cand, edges,
                                          config, config.connection_blend)
            if value <= 0.0:
                continue
            if reverse_match:
                sig_t = max(tgt[2], config.min_xy_scale)
                rv, back = _best_connection(q ^ 1, tgt[0], tgt[1], sig_t,
                                            cand, edges, config, blend=False)
                back2 = (back[0] - x) ** 2 + (back[1] - y) ** 2
                if not (rv > 0.0
                        and back2 <= (config.filter_factor ** 2) * sigma ** 2):
                    continue
            new_v = np.sqrt(value * vs)
            if new_v <= keypoint_threshold \
                    or new_v <= config.keypoint_threshold_rel * vs:
                continue
            if value > best[0]:
                best = (value, (t_kp, tgt, new_v))
        if best[1] is None:
            return
        t_kp, (tx, ty, ts), new_v = best[1]
        pose[t_kp] = (tx, ty, new_v, ts)
        placed[t_kp] = True


def decode_sequential(seeds: Seeds, cand: CafCandidates,
                      skeleton: np.ndarray, *, n_keypoints: int, image_hw,
                      config: GrowthConfig = GrowthConfig(),
                      force_cand: CafCandidates = None) -> List[np.ndarray]:
    """Reference-scheduled decode: returns the grown poses (K, 4) in seed
    consumption order (before NMS/instance scoring).

    ``force_cand``: relaxed-threshold candidate set consumed only by the
    force-complete second pass (mirrors ``growth.grow``'s ``force_cand``).
    """
    edges = directed_edges(np.asarray(skeleton))
    occupancy = Occupancy(n_keypoints, image_hw)
    poses: List[np.ndarray] = []

    # one host transfer up front: the growth loop below indexes per scalar
    # (per-op device round-trips would dominate otherwise)
    seeds = Seeds(*[np.asarray(a) for a in seeds])
    cand = CafCandidates(*[np.asarray(a) for a in cand])
    if force_cand is not None:
        force_cand = CafCandidates(*[np.asarray(a) for a in force_cand])

    order = np.argsort(-seeds.v, kind='stable')
    for si in order:
        if len(poses) >= config.max_poses:
            break
        if not bool(seeds.valid[si]):
            continue
        f = int(seeds.f[si])
        x, y, v, s = (float(seeds.x[si]), float(seeds.y[si]),
                      float(seeds.v[si]), float(seeds.s[si]))
        if occupancy.get(f, x, y):
            continue
        pose = np.zeros((n_keypoints, 4), np.float32)
        placed = np.zeros(n_keypoints, bool)
        pose[f] = (x, y, v, s)
        placed[f] = True
        _grow_pose(pose, placed, cand, edges, config,
                   config.keypoint_threshold, config.reverse_match)
        if config.force_complete:
            relaxed = dataclasses.replace(config, keypoint_threshold_rel=0.0)
            fc = force_cand if force_cand is not None else cand
            _grow_pose(pose, placed, fc, edges, relaxed,
                       config.force_complete_threshold, reverse_match=False)
        for k in range(n_keypoints):
            if placed[k]:
                occupancy.set(k, pose[k, 0], pose[k, 1], pose[k, 3])
        poses.append(pose)
    return poses
