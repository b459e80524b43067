"""Randomized crowd-scene drift harness: parallel decode vs the oracle.

SURVEY.md §7 "hard parts": the reference decoder is order-dependent — seeds
are consumed in score order against an occupancy grid
(``src/openpifpaf/csrc/src/decoder/cifcaf.cpp:~140``) — while the
production decoder grows all poses at once and substitutes seed dedup +
NMS ``dedup_fraction`` for occupancy.  This harness quantifies that
*scheduling* drift where it matters: dense, overlapping, scale-varied
crowds with partial occlusion.

Both paths consume the byte-identical jitted front-end
(``ops.pipeline.decode_front_end``: CifHr -> seeds -> CAF candidates) and
are finalized by the byte-identical NMS + scoring
(``ops.pipeline.finalize_poses``), so every reported deviation is growth
scheduling and occupancy-vs-dedup, nothing else.

Used by ``tests/test_drift.py`` (CI gate) and ``tools/drift_report.py``
(500-scene report -> DRIFT.md).
"""

import dataclasses
from typing import Optional, Sequence

import numpy as np

from openpifpaf_tpu import headmeta
from openpifpaf_tpu.ops import growth, pipeline, sequential_oracle
from openpifpaf_tpu.plugins.coco import constants

from test_decoder import paint_cif, paint_caf

SIGMAS = np.asarray(constants.COCO_PERSON_SIGMAS, np.float32)
SCORE_WEIGHTS = np.asarray(constants.COCO_PERSON_SCORE_WEIGHTS, np.float32)
IMAGE_HW = (961, 961)   # 61x61 field grid at stride 16
GRID_HW = (61, 61)


def _hflip_perm(keypoints, hflip):
    return np.asarray([keypoints.index(hflip.get(name, name))
                       for name in keypoints], np.int32)


@dataclasses.dataclass
class SceneSpec:
    """Keypoint-family parameters of the harness (VERDICT r3 #7: the drift
    evidence must cover arbitrary head metas, not just COCO-17)."""

    name: str
    keypoints: Sequence[str]
    sigmas: np.ndarray
    score_weights: np.ndarray
    skeleton: Sequence            # 1-based joint index pairs
    upright_pose: np.ndarray      # (K, 3)
    hflip_perm: Optional[np.ndarray] = None
    image_hw: tuple = IMAGE_HW
    grid_hw: tuple = GRID_HW
    # person pixel-scale range: wholebody needs larger figures so the
    # face/hand keypoint clusters resolve to distinct feature cells
    scale_range: tuple = (8.0, 22.0)

    @property
    def n_keypoints(self):
        return len(self.keypoints)


COCO_SPEC = SceneSpec(
    name='coco',
    keypoints=constants.COCO_KEYPOINTS,
    sigmas=SIGMAS,
    score_weights=SCORE_WEIGHTS,
    skeleton=constants.COCO_PERSON_SKELETON,
    upright_pose=constants.COCO_UPRIGHT_POSE,
    hflip_perm=_hflip_perm(constants.COCO_KEYPOINTS, constants.HFLIP),
)

_HFLIP_PERM = COCO_SPEC.hflip_perm     # back-compat


def wholebody_spec() -> SceneSpec:
    """133 keypoints / 129 edges — the deep-limb-chain budget stress."""
    from openpifpaf_tpu.plugins.wholebody import constants as wb

    return SceneSpec(
        name='wholebody',
        keypoints=list(wb.KEYPOINTS),
        sigmas=np.asarray(wb.SIGMAS, np.float32),
        score_weights=np.ones(len(wb.KEYPOINTS), np.float32),
        skeleton=wb.SKELETON,
        upright_pose=np.asarray(wb.UPRIGHT_POSE, np.float32),
        hflip_perm=_hflip_perm(list(wb.KEYPOINTS), wb.HFLIP),
        scale_range=(28.0, 64.0),
    )


def metas_for(spec: SceneSpec):
    cif_meta = headmeta.Cif(
        'cif', spec.name, keypoints=list(spec.keypoints),
        sigmas=list(np.asarray(spec.sigmas, np.float32)),
        score_weights=list(np.asarray(spec.score_weights, np.float32)))
    caf_meta = headmeta.Caf(
        'caf', spec.name, keypoints=list(spec.keypoints),
        sigmas=list(np.asarray(spec.sigmas, np.float32)),
        skeleton=spec.skeleton)
    return cif_meta, caf_meta


def build_fields(poses_and_scales, h=GRID_HW[0], w=GRID_HW[1], stride=16,
                 spec: SceneSpec = COCO_SPEC):
    """Paint raw CIF/CAF fields for any keypoint family."""
    cif = np.zeros((spec.n_keypoints, 5, h, w), np.float32)
    caf = np.zeros((len(spec.skeleton), 9, h, w), np.float32)
    cif[:, 0] = -10.0
    caf[:, 0] = -10.0
    for kp, scales in poses_and_scales:
        paint_cif(cif, kp, scales, stride)
        paint_caf(caf, kp, scales, spec.skeleton, stride)
    return cif, caf


def harness_config(max_poses: int = 128, *, image_hw=IMAGE_HW,
                   max_seeds: int = 1024, max_candidates: int = 512,
                   **growth_updates) -> pipeline.CifCafConfig:
    """Production defaults with budgets raised so static-budget overflow
    (which hits both paths identically) does not mask scheduling drift at
    60-pose density.  When force_complete is on, the second pass gets its
    own relaxed candidate set with a doubled budget, exactly like the
    production decoder (``decoder/cifcaf.py`` config: score_th 0.001,
    2x max_candidates).

    ``max_poses`` binds asymmetrically under field noise: duplicate seeds
    occupy parallel pose slots before the seed-claim suppression can kill
    them, while the sequential oracle skips occupied seeds and spends its
    budget on fresh ones — so noisy dense scenes need a larger budget for
    the comparison to measure scheduling rather than slot exhaustion
    (measured: 55-pose noisy scenes F1 0.960 at 128 -> 0.996 at 256; the
    production counter for this is ``n_dropped_poses``)."""
    config = pipeline.CifCafConfig(stride=16, image_hw=image_hw)
    growth_config = dataclasses.replace(config.growth, max_poses=max_poses,
                                        **growth_updates)
    caf_fc = None
    if growth_config.force_complete:
        caf_fc = dataclasses.replace(
            config.caf, score_th=growth_config.force_complete_threshold,
            max_candidates=2 * max_candidates)
    config = dataclasses.replace(
        config,
        seeds=dataclasses.replace(config.seeds, max_seeds=max_seeds),
        caf=dataclasses.replace(config.caf, max_candidates=max_candidates),
        caf_fc=caf_fc,
        growth=growth_config,
    )
    return config


# ---------------------------------------------------------------------------
# scene generation
# ---------------------------------------------------------------------------

def random_scene(rng: np.random.Generator, n_poses: int,
                 spec: SceneSpec = COCO_SPEC):
    """n_poses clustered, scale-varied, partially occluded upright poses.

    Returns a list of (kp (K,3) px, scales (K,) px) painting inputs.
    Clustering forces overlap (the occupancy-order regime); random hflip
    and per-joint jitter vary the geometry.
    """
    h, w = spec.image_hw
    n_kp = spec.n_keypoints
    pose_y_top = float(spec.upright_pose[:, 1].max())
    pose_y_half = (pose_y_top - float(spec.upright_pose[:, 1].min())) / 2.0
    n_clusters = max(1, int(np.ceil(n_poses / 6)))
    clusters = rng.uniform(150, min(h, w) - 150, size=(n_clusters, 2))
    poses = []
    for _ in range(n_poses):
        scale = float(rng.uniform(*spec.scale_range))
        cx, cy = clusters[int(rng.integers(n_clusters))]
        cx += float(rng.normal(0, 70.0))
        cy += float(rng.normal(0, 70.0))

        unit = np.asarray(spec.upright_pose, np.float32).copy()
        if spec.hflip_perm is not None and rng.uniform() < 0.5:
            unit = unit[spec.hflip_perm]
            unit[:, 0] = -unit[:, 0]
        kp = np.zeros((n_kp, 3), np.float32)
        kp[:, 0] = unit[:, 0] * scale + cx
        kp[:, 1] = (pose_y_top - unit[:, 1]) * scale + cy \
            - pose_y_half * scale
        kp[:, :2] += rng.normal(0, 0.06 * scale, size=(n_kp, 2))
        kp[:, 0] = np.clip(kp[:, 0], 8.0, w - 9.0)
        kp[:, 1] = np.clip(kp[:, 1], 8.0, h - 9.0)
        kp[:, 2] = 2.0

        # partial occlusion: drop a random subset of joints
        if rng.uniform() < 0.4:
            n_drop = int(rng.integers(3, max(4, (n_kp * 10) // 17)))
            drop = rng.choice(n_kp, size=n_drop, replace=False)
            kp[drop, 2] = 0.0

        scales = np.maximum(4.0, np.asarray(spec.sigmas, np.float32)
                            * scale * 4)
        poses.append((kp, scales))
    return poses


# ---------------------------------------------------------------------------
# field-level realism noise (VERDICT r2 weak #2: clean synthetic fields are
# necessary, not sufficient — trained fields are noisy, with near-threshold
# seeds and spurious activations, exactly the regime where occupancy-order
# scheduling bites)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FieldNoise:
    """Perturbations applied to the raw painted fields.  Both decode paths
    consume the identical noisy front-end, so the reported drift stays pure
    scheduling — measured now under realistic candidate distributions."""

    conf_logit_sigma: float = 0.7      # per-cell confidence jitter (logits)
    peak_conf_range: tuple = (0.25, 1.0)   # per-joint peak confidence
    offset_sigma: float = 0.15         # regression noise, feature-cell units
    scale_lognorm_sigma: float = 0.25  # joint-scale multiplicative noise
    spurious_blobs: int = 40           # fake CIF activations per scene
    spurious_conf: tuple = (0.15, 0.6)     # their confidence range
    spurious_caf: int = 40             # fake CAF cells per scene


def _inv_sigmoid(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


def _inv_softplus(s):
    return np.log(np.expm1(np.maximum(s, 1e-6)))


def apply_field_noise(cif: np.ndarray, caf: np.ndarray,
                      rng: np.random.Generator, noise: FieldNoise):
    """In-place perturbation of raw (pre-activation) painted fields."""
    h, w = cif.shape[-2:]
    painted_cif = cif[:, 0] > -5.0
    painted_caf = caf[:, 0] > -5.0

    # per-joint peak confidence attenuation -> near-threshold seeds
    lo, hi = noise.peak_conf_range
    atten = _inv_sigmoid(rng.uniform(lo, hi, size=cif.shape[0]))
    atten = np.minimum(0.0, atten - _inv_sigmoid(0.999))
    cif[:, 0] += np.where(painted_cif, atten[:, None, None], 0.0)

    # confidence jitter (painted cells only; background stays far below
    # threshold by construction)
    cif[:, 0] += np.where(
        painted_cif, rng.normal(0.0, noise.conf_logit_sigma, painted_cif.shape),
        0.0)
    caf[:, 0] += np.where(
        painted_caf, rng.normal(0.0, noise.conf_logit_sigma, painted_caf.shape),
        0.0)

    # offset regression noise (feature-cell units)
    for ch in (1, 2):
        cif[:, ch] += np.where(
            painted_cif, rng.normal(0.0, noise.offset_sigma, painted_cif.shape),
            0.0)
    for ch in (1, 2, 3, 4):
        caf[:, ch] += np.where(
            painted_caf, rng.normal(0.0, noise.offset_sigma, painted_caf.shape),
            0.0)

    # joint-scale multiplicative noise (decode softplus, scale, re-encode)
    sc = np.log1p(np.exp(np.minimum(cif[:, 4], 30.0)))
    sc = sc * np.exp(rng.normal(0.0, noise.scale_lognorm_sigma, sc.shape))
    cif[:, 4] = np.where(painted_cif, _inv_softplus(sc), cif[:, 4])

    # spurious CIF blobs: plausible-looking fake activations
    for _ in range(noise.spurious_blobs):
        f = int(rng.integers(cif.shape[0]))
        i, j = int(rng.integers(w)), int(rng.integers(h))
        conf = float(rng.uniform(*noise.spurious_conf))
        cif[f, 0, j, i] = _inv_sigmoid(conf)
        cif[f, 1, j, i] = float(rng.uniform(-0.5, 0.5))
        cif[f, 2, j, i] = float(rng.uniform(-0.5, 0.5))
        cif[f, 3, j, i] = _inv_softplus(0.5)
        cif[f, 4, j, i] = _inv_softplus(float(rng.uniform(0.3, 1.5)))

    # spurious CAF cells: fake association evidence
    for _ in range(noise.spurious_caf):
        e = int(rng.integers(caf.shape[0]))
        i, j = int(rng.integers(w)), int(rng.integers(h))
        conf = float(rng.uniform(*noise.spurious_conf))
        caf[e, 0, j, i] = _inv_sigmoid(conf)
        for ch in (1, 2, 3, 4):
            caf[e, ch, j, i] = float(rng.uniform(-3.0, 3.0))
        caf[e, 5, j, i] = caf[e, 6, j, i] = _inv_softplus(0.5)
        caf[e, 7, j, i] = caf[e, 8, j, i] = _inv_softplus(
            float(rng.uniform(0.3, 1.5)))
    return cif, caf


# ---------------------------------------------------------------------------
# decode paths
# ---------------------------------------------------------------------------

class Harness:
    """Compiled-once front-end + production back-end + oracle runner."""

    def __init__(self, config: pipeline.CifCafConfig = None,
                 spec: SceneSpec = COCO_SPEC):
        import jax

        self.spec = spec
        self.config = config or harness_config(image_hw=spec.image_hw)
        self.cif_meta, self.caf_meta = metas_for(spec)
        self.skeleton = np.asarray(self.caf_meta.skeleton, np.int32) - 1
        n_kp = spec.n_keypoints
        score_weights = np.asarray(spec.score_weights, np.float32)
        self.n_keypoints = n_kp
        edges = growth.directed_edges(self.skeleton)
        cfg = self.config

        @jax.jit
        def front(cif, caf):
            return pipeline.decode_front_end(
                cif, caf, cif_meta=self.cif_meta, caf_meta=self.caf_meta,
                config=cfg)

        @jax.jit
        def back(fe):
            poses, placed, alive, _, _, _ = growth.grow_waves(
                fe.sds, fe.cands, edges, n_keypoints=n_kp,
                image_hw=cfg.image_hw, config=cfg.growth,
                nms_config=cfg.nms, force_cand=fe.cands_fc)
            return pipeline.finalize_poses(
                poses, placed, alive, fe.scale_px,
                score_weights=score_weights, config=cfg, seed_f=None)

        @jax.jit
        def finalize(poses, placed, pose_valid, scale_px):
            return pipeline.finalize_poses(
                poses, placed, pose_valid, scale_px,
                score_weights=score_weights, config=cfg)

        self._front = front
        self._back = back
        self._finalize = finalize

    def decode_both(self, scene, noise: FieldNoise = None,
                    noise_rng: np.random.Generator = None):
        """scene: list of (kp, scales) -> (parallel poses, oracle poses),
        each a score-descending list of (xyv (K,3), score)."""
        cif, caf = build_fields(scene, h=self.spec.grid_hw[0],
                                w=self.spec.grid_hw[1], spec=self.spec)
        if noise is not None:
            apply_field_noise(cif, caf, noise_rng or np.random.default_rng(0),
                              noise)
        fe = self._front(cif, caf)

        p_poses, _, p_scores, p_valid = self._back(fe)
        parallel = _extract(np.asarray(p_poses), np.asarray(p_scores),
                            np.asarray(p_valid))

        o_list = sequential_oracle.decode_sequential(
            fe.sds, fe.cands, self.skeleton, n_keypoints=self.n_keypoints,
            image_hw=self.config.image_hw, config=self.config.growth,
            force_cand=fe.cands_fc)
        p_budget = self.config.growth.max_poses
        o_poses = np.zeros((p_budget, self.n_keypoints, 4), np.float32)
        o_placed = np.zeros((p_budget, self.n_keypoints), bool)
        o_valid = np.zeros(p_budget, bool)
        for i, pose in enumerate(o_list[:p_budget]):
            o_poses[i] = pose
            o_placed[i] = pose[:, 2] > 0
            o_valid[i] = True
        oo_poses, _, oo_scores, oo_valid = self._finalize(
            o_poses, o_placed, o_valid, fe.scale_px)
        oracle = _extract(np.asarray(oo_poses), np.asarray(oo_scores),
                          np.asarray(oo_valid))
        return parallel, oracle


def _extract(poses, scores, valid):
    out = [(poses[i, :, :3], float(scores[i]))
           for i in range(len(valid)) if valid[i]]
    out.sort(key=lambda t: -t[1])
    return out


# ---------------------------------------------------------------------------
# agreement metrics
# ---------------------------------------------------------------------------

def oks(ref_xyv, other_xyv, sigmas: np.ndarray = SIGMAS):
    """OKS of ``other`` against ``ref`` (visible-in-ref joints)."""
    vis = ref_xyv[:, 2] > 0
    if vis.sum() == 0:
        return 0.0
    x, y = ref_xyv[vis, 0], ref_xyv[vis, 1]
    area = max(float((x.max() - x.min()) * (y.max() - y.min())), 1.0)
    d2 = ((ref_xyv[:, :2] - other_xyv[:, :2]) ** 2).sum(-1)
    e = d2 / (2.0 * area * (2.0 * sigmas) ** 2)
    return float(np.exp(-e)[vis].mean())


def scene_agreement(parallel, oracle, *, oks_match: float = 0.5,
                    sigmas: np.ndarray = SIGMAS):
    """Greedy OKS matching (oracle score order); per-scene metrics dict."""
    used = set()
    matched = []
    for o_xyv, o_score in oracle:
        best, best_oks = None, oks_match
        for pi, (p_xyv, _) in enumerate(parallel):
            if pi in used:
                continue
            v = oks(o_xyv, p_xyv, sigmas)
            if v > best_oks:
                best, best_oks = pi, v
        if best is not None:
            used.add(best)
            matched.append((o_xyv, o_score, *parallel[best], best_oks))

    n_o, n_p, n_m = len(oracle), len(parallel), len(matched)
    f1 = 2.0 * n_m / (n_o + n_p) if (n_o + n_p) else 1.0
    if matched:
        mean_oks = float(np.mean([m[4] for m in matched]))
        score_delta = float(np.mean([abs(m[1] - m[3]) for m in matched]))
        joint_agree = float(np.mean([
            ((m[0][:, 2] > 0) == (m[2][:, 2] > 0)).mean() for m in matched]))
    else:
        mean_oks = score_delta = joint_agree = float('nan')
    return {
        'n_oracle': n_o, 'n_parallel': n_p, 'n_matched': n_m, 'f1': f1,
        'mean_oks': mean_oks, 'score_delta': score_delta,
        'joint_agreement': joint_agree,
    }


def run_scenes(harness: Harness, seeds_and_densities,
               noise: FieldNoise = None):
    """[(seed, n_poses), ...] -> list of per-scene metrics dicts."""
    results = []
    sigmas = np.asarray(harness.spec.sigmas, np.float32)
    for seed, n_poses in seeds_and_densities:
        rng = np.random.default_rng(seed)
        scene = random_scene(rng, n_poses, spec=harness.spec)
        parallel, oracle = harness.decode_both(scene, noise=noise,
                                               noise_rng=rng)
        m = scene_agreement(parallel, oracle, sigmas=sigmas)
        m['seed'] = seed
        m['n_poses'] = n_poses
        results.append(m)
    return results


def aggregate(results):
    """Micro-averaged detection agreement + means of per-scene metrics."""
    n_o = sum(r['n_oracle'] for r in results)
    n_p = sum(r['n_parallel'] for r in results)
    n_m = sum(r['n_matched'] for r in results)
    vals = {k: [r[k] for r in results if np.isfinite(r[k])]
            for k in ('mean_oks', 'score_delta', 'joint_agreement')}
    return {
        'n_scenes': len(results),
        'n_oracle': n_o, 'n_parallel': n_p, 'n_matched': n_m,
        'detection_f1': 2.0 * n_m / (n_o + n_p) if (n_o + n_p) else 1.0,
        'mean_oks': float(np.mean(vals['mean_oks'])),
        'mean_score_delta': float(np.mean(vals['score_delta'])),
        'mean_joint_agreement': float(np.mean(vals['joint_agreement'])),
    }
