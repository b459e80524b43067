"""Parallel decoder vs the sequential-faithful oracle.

SURVEY.md §7 "hard parts": the reference decoder is order-dependent (seed
order + occupancy); the production decoder grows all poses at once.  The
oracle (``ops/sequential_oracle.py``) keeps the reference scheduling with
the same per-connection math; these tests bound the deviation: on
synthetic fields both must find the same poses with matching joints.
"""

import numpy as np
import pytest

from openpifpaf_tpu import ops
from openpifpaf_tpu.models.heads import split_fields
from openpifpaf_tpu.ops import (caf_scored, cif_hr, growth, nms,
                                seeds as seeds_mod, sequential_oracle)
from openpifpaf_tpu.plugins.coco import constants

from test_decoder import build_fields, metas, synthetic_pose

STRIDE = 16


def intermediates(cif, caf, image_hw):
    """The pipeline's shared front-end: CifHr -> seeds -> CAF candidates."""
    cif_meta, caf_meta = metas()
    skeleton = np.asarray(caf_meta.skeleton, np.int32) - 1
    cifc = split_fields(np.asarray(cif), cif_meta)
    cafc = split_fields(np.asarray(caf), caf_meta)

    hr_config = cif_hr.CifHrConfig()
    hr_hw = (image_hw[0] // hr_config.spacing, image_hw[1] // hr_config.spacing)
    hr = cif_hr.accumulate_from_fields(cifc, stride=STRIDE, out_hw=hr_hw,
                                       config=hr_config)
    sds = seeds_mod.select_from_fields(
        cifc, hr, stride=STRIDE, hr_spacing=hr_config.spacing,
        config=seeds_mod.SeedsConfig())
    cands = caf_scored.score(cafc, hr, skeleton, stride=STRIDE,
                             hr_spacing=hr_config.spacing,
                             config=caf_scored.CafScoredConfig())
    return sds, cands, skeleton


def grow_parallel(sds, cands, skeleton, config, image_hw=(321, 321)):
    """Parallel growth + seed-claim suppression + the production NMS —
    the exact counterpart of the oracle's seed-time occupancy check."""
    import jax.numpy as jnp

    edges = growth.directed_edges(skeleton)
    poses, placed, pose_valid, _, _, seed_f = growth.init_poses(
        sds, n_keypoints=17, config=config)
    poses, placed = growth.grow(poses, placed, pose_valid, cands, edges,
                                config)
    nms_config = nms.NMSConfig()
    pose_valid = nms.seed_claim_suppression(
        poses, placed, pose_valid, seed_f, image_hw=image_hw,
        config=nms_config)
    poses = poses.at[..., 2].set(
        jnp.where(placed, poses[..., 2], 0.0))
    joint_scales = jnp.where(placed, poses[..., 3], 0.0)
    poses_out, _, valid = nms.keypoint_nms(
        poses, pose_valid, joint_scales, jnp.ones(17), nms_config)
    poses_out = np.asarray(poses_out)
    valid = np.asarray(valid)
    return [poses_out[p] for p in range(poses_out.shape[0]) if valid[p]]


def apply_nms(pose_list):
    """Run a pose list through the production keypoint NMS
    (reference: NMSKeypoints runs after the seed loop, cifcaf.cpp:~180)."""
    import jax.numpy as jnp

    if not pose_list:
        return []
    poses = jnp.asarray(np.stack(pose_list))
    pose_valid = jnp.ones(len(pose_list), bool)
    joint_scales = jnp.where(poses[..., 2] > 0, poses[..., 3], 0.0)
    poses_out, _, valid = nms.keypoint_nms(
        poses, pose_valid, joint_scales, jnp.ones(17), nms.NMSConfig())
    poses_out = np.asarray(poses_out)
    valid = np.asarray(valid)
    return [poses_out[p] for p in range(len(pose_list)) if valid[p]]


def match_poses(a_list, b_list):
    """Greedy-match poses by mean joint distance; return per-pair arrays."""
    pairs = []
    used = set()
    for a in a_list:
        best, best_d = None, np.inf
        for bi, b in enumerate(b_list):
            if bi in used:
                continue
            both = (a[:, 2] > 0) & (b[:, 2] > 0)
            if both.sum() == 0:
                continue
            d = np.linalg.norm(a[both, :2] - b[both, :2], axis=1).mean()
            if d < best_d:
                best, best_d = bi, d
        assert best is not None
        used.add(best)
        pairs.append((a, b_list[best], best_d))
    return pairs


@pytest.mark.parametrize('n_poses', [1, 2, 3])
def test_parallel_matches_oracle(n_poses):
    offsets = [(-95.0, 0.0), (95.0, 0.0), (0.0, -60.0)][:n_poses]
    poses_in = [synthetic_pose(offset_px=o, scale=16.0) for o in offsets]
    cif, caf = build_fields(poses_in)
    image_hw = (321, 321)

    sds, cands, skeleton = intermediates(cif, caf, image_hw)
    config = growth.GrowthConfig()

    oracle = sequential_oracle.decode_sequential(
        sds, cands, skeleton, n_keypoints=17, image_hw=image_hw,
        config=config)
    oracle = apply_nms(oracle)  # the reference also NMSes after growth
    parallel = grow_parallel(sds, cands, skeleton, config)

    assert len(oracle) == len(parallel) == n_poses
    for a, b, d in match_poses(oracle, parallel):
        # same joints found
        np.testing.assert_array_equal(a[:, 2] > 0, b[:, 2] > 0)
        assert d < 4.0, d
        both = (a[:, 2] > 0) & (b[:, 2] > 0)
        np.testing.assert_allclose(a[both, :2], b[both, :2], atol=4.0)


def test_oracle_occupancy_suppresses_duplicate_seeds():
    """Two identical overlapping poses: occupancy must yield one pose."""
    kp, scales = synthetic_pose(scale=16.0)
    cif, caf = build_fields([(kp, scales), (kp, scales)])
    sds, cands, skeleton = intermediates(cif, caf, (321, 321))
    oracle = sequential_oracle.decode_sequential(
        sds, cands, skeleton, n_keypoints=17, image_hw=(321, 321),
        config=growth.GrowthConfig())
    assert len(oracle) == 1


class TestWaveRecycledBudget:
    """r5 ``growth.grow_waves``: claimed seeds must never consume
    ``max_poses`` budget (the reference's ``cifcaf.cpp:~140`` semantics).

    Scene: 6 separated figures produce ~100 seeds (one per visible
    keypoint field).  With ``max_poses=8`` the single-wave path spends
    its 8 slots on the strongest raw seeds (several per figure — the
    radius dedup only merges same-field neighbors) and the claim fixpoint
    kills the duplicates, leaving FEWER than 6 poses; the wave loop
    refills freed slots and must recover every figure the oracle finds.
    """

    def scene(self):
        figs = [synthetic_pose(offset_px=(dx, dy), scale=12.0)
                for dx, dy in ((-120, -60), (0, -60), (120, -60),
                               (-120, 80), (0, 80), (120, 80))]
        cif, caf = build_fields(figs)
        return intermediates(np.asarray(cif), np.asarray(caf), (321, 321))

    def test_waves_match_oracle_under_budget_pressure(self):
        import jax.numpy as jnp

        sds, cands, skeleton = self.scene()
        config = growth.GrowthConfig(max_poses=8)
        nms_config = nms.NMSConfig()
        edges = growth.directed_edges(skeleton)

        o_list = sequential_oracle.decode_sequential(
            sds, cands, skeleton, n_keypoints=17, image_hw=(321, 321),
            config=config)
        n_o = len(o_list)
        # all 6 figures found (plus possibly partial-duplicate poses from
        # seeds the grown poses' occupancy does not cover)
        assert 6 <= n_o <= 8

        poses, placed, alive, n_dropped, _, _ = growth.grow_waves(
            sds, cands, edges, n_keypoints=17, image_hw=(321, 321),
            config=config, nms_config=nms_config)
        assert int(np.asarray(alive).sum()) == n_o

        # same figures: every oracle pose OKS-matched by an alive wave pose
        alive_np = np.asarray(alive)
        got = np.asarray(poses)[alive_np]
        for o_pose in o_list:
            o_xy = o_pose[o_pose[:, 2] > 0, :2]
            dists = [
                float(np.abs(g[o_pose[:, 2] > 0, :2] - o_xy).max())
                for g in got]
            assert min(dists) < 1.0, 'oracle figure missing from wave decode'

    def test_single_wave_underfills(self):
        """Documents WHY the wave loop exists: one wave at the same
        budget recovers fewer poses (slots wasted on claimed seeds)."""
        sds, cands, skeleton = self.scene()
        config = growth.GrowthConfig(max_poses=8, max_waves=1)
        edges = growth.directed_edges(skeleton)
        o_list = sequential_oracle.decode_sequential(
            sds, cands, skeleton, n_keypoints=17, image_hw=(321, 321),
            config=growth.GrowthConfig(max_poses=8))
        _, _, alive, _, _, _ = growth.grow_waves(
            sds, cands, edges, n_keypoints=17, image_hw=(321, 321),
            config=config, nms_config=nms.NMSConfig())
        assert int(np.asarray(alive).sum()) < len(o_list)
