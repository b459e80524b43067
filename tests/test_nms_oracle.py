"""Parallel keypoint NMS vs a sequential-claim oracle.

VERDICT r1 weak item 3: the fixed two-round NMS had no test probing a
pathological suppression chain (A suppresses B suppresses C: the
reference's sequential claim walk keeps C because B never claims).  The
restart-round ``while_loop`` in ``ops/nms.py`` must now reproduce the
sequential result exactly, chains of any depth included.

The oracle mirrors ``nms_keypoints.cpp:~20`` scheduling with the same
pairwise-distance geometry as the production op (claimant-radius reach),
isolating the *scheduling* semantics.
"""

import dataclasses

import numpy as np
import pytest

from openpifpaf_tpu.ops import nms

K = 3
WEIGHTS = np.ones(K, np.float32)


def sequential_nms(poses, joint_scales, config: nms.NMSConfig):
    """Reference-scheduled claim walk; returns suppressed joint v (P, K)."""
    poses = np.asarray(poses)
    p = poses.shape[0]
    v0 = np.where(poses[..., 2] >= config.keypoint_threshold,
                  poses[..., 2], 0.0)
    radius = np.maximum(config.suppression_radius,
                        config.scale_factor * np.asarray(joint_scales))
    scores = np.asarray(nms.pose_scores(v0, WEIGHTS))
    order = sorted(range(p), key=lambda i: (-scores[i], i))

    v = v0.copy()
    claimants = []  # (k, x, y, reach)
    for pi in order:
        for ki in range(K):
            if v[pi, ki] <= 0.0:
                continue
            x, y = poses[pi, ki, 0], poses[pi, ki, 1]
            for (ck, cx, cy, cr) in claimants:
                if ck != ki:
                    continue
                if (x - cx) ** 2 + (y - cy) ** 2 < cr * cr:
                    v[pi, ki] = 0.0
                    break
        for ki in range(K):
            if v[pi, ki] > 0.0:
                claimants.append((ki, poses[pi, ki, 0], poses[pi, ki, 1],
                                  radius[pi, ki]))
    return v


def run_both(poses, joint_scales, **config_updates):
    import jax.numpy as jnp

    config = dataclasses.replace(
        nms.NMSConfig(instance_threshold=0.0, min_joints=1,
                      dedup_fraction=1.1),     # isolate joint suppression
        **config_updates)
    poses = np.asarray(poses, np.float32)
    joint_scales = np.asarray(joint_scales, np.float32)
    out, scores, valid = nms.keypoint_nms(
        jnp.asarray(poses), jnp.ones(poses.shape[0], bool),
        jnp.asarray(joint_scales), jnp.asarray(WEIGHTS), config)
    got = np.asarray(out[..., 2])
    want = sequential_nms(poses, joint_scales, config)
    return got, want


def pose_at(x, score, dy=100.0):
    """K joints stacked vertically at x; all joint v = score."""
    pose = np.zeros((K, 4), np.float32)
    for ki in range(K):
        pose[ki] = (x, ki * dy, score, 1.0)
    return pose


class TestChains:
    def test_chain_a_b_c(self):
        """A(0.9) kills B(0.8); C(0.7) overlaps only B -> C survives."""
        poses = np.stack([pose_at(0.0, 0.9), pose_at(3.0, 0.8),
                          pose_at(6.0, 0.7)])
        scales = np.ones((3, K), np.float32)
        got, want = run_both(poses, scales)
        np.testing.assert_array_equal(got, want)
        assert (got[2] > 0).all()    # C survives (radius 4: C-B 3 < 4 < C-A 6)
        assert (got[1] == 0).all()

    @pytest.mark.parametrize('depth', [4, 6, 9])
    def test_deep_chain(self, depth):
        """Alternating survival down an arbitrary-depth chain."""
        poses = np.stack([pose_at(3.0 * i, 0.9 - 0.05 * i)
                          for i in range(depth)])
        scales = np.ones((depth, K), np.float32)
        got, want = run_both(poses, scales)
        np.testing.assert_array_equal(got, want)
        for i in range(depth):
            alive = (got[i] > 0).all()
            assert alive == (i % 2 == 0), (i, got[:, 0])

    def test_tied_scores_break_by_index(self):
        poses = np.stack([pose_at(0.0, 0.5), pose_at(3.0, 0.5)])
        scales = np.ones((2, K), np.float32)
        got, want = run_both(poses, scales)
        np.testing.assert_array_equal(got, want)
        assert (got[0] > 0).all() and (got[1] == 0).all()

    def test_claimant_radius_not_max(self):
        """Suppression reach is the claimant's radius: a big low-score pose
        near a small high-score one is NOT suppressed when only its own
        (large) radius would reach."""
        poses = np.stack([pose_at(0.0, 0.9), pose_at(6.0, 0.5)])
        scales = np.stack([np.full(K, 2.0), np.full(K, 20.0)])
        # claimant (pose 0) radius = max(4, 0.5*2) = 4 < 6 -> no suppression
        got, want = run_both(poses, scales)
        np.testing.assert_array_equal(got, want)
        assert (got[1] > 0).all()
        # reversed roles: big pose wins, its radius max(4, 10)=10 > 6 kills
        poses2 = np.stack([pose_at(0.0, 0.5), pose_at(6.0, 0.9)])
        got2, want2 = run_both(poses2, scales)
        np.testing.assert_array_equal(got2, want2)
        assert (got2[0] == 0).all()


@pytest.mark.parametrize('seed', range(25))
def test_random_scenes_match_sequential(seed):
    """Dense random overlap soup: parallel == sequential exactly."""
    rng = np.random.default_rng(seed)
    p = int(rng.integers(2, 24))
    poses = np.zeros((p, K, 4), np.float32)
    poses[..., 0] = rng.uniform(0, 40, (p, K))      # crowded x
    poses[..., 1] = rng.uniform(0, 40, (p, K))
    poses[..., 2] = np.round(rng.uniform(0.0, 1.0, (p, K)), 1)  # ties
    poses[..., 3] = rng.uniform(1.0, 8.0, (p, K))
    scales = rng.uniform(1.0, 16.0, (p, K)).astype(np.float32)
    got, want = run_both(poses, scales)
    np.testing.assert_array_equal(got, want)


class TestSeedClaimSuppression:
    """The post-growth fixpoint must equal the oracle's sequential
    seed-time occupancy walk (``sequential_oracle.Occupancy``) exactly,
    including the grid quantization and suppression chains (a pose whose
    seed was claimed never claims anything itself)."""

    IMAGE_HW = (321, 321)

    @staticmethod
    def sequential_alive(poses, placed, valid, seed_f):
        from openpifpaf_tpu.ops.sequential_oracle import Occupancy

        p, k = placed.shape
        occ = Occupancy(k, TestSeedClaimSuppression.IMAGE_HW)
        alive = np.zeros(p, bool)
        for pi in range(p):          # slots are already in seed order
            if not valid[pi]:
                continue
            f = int(seed_f[pi])
            if occ.get(f, float(poses[pi, f, 0]), float(poses[pi, f, 1])):
                continue
            alive[pi] = True
            for ki in range(k):
                if placed[pi, ki]:
                    occ.set(ki, float(poses[pi, ki, 0]),
                            float(poses[pi, ki, 1]), float(poses[pi, ki, 3]))
        return alive

    @pytest.mark.parametrize('seed', range(20))
    def test_random_matches_sequential(self, seed):
        import jax.numpy as jnp

        rng = np.random.default_rng(seed)
        p, k = int(rng.integers(2, 32)), 5
        poses = np.zeros((p, k, 4), np.float32)
        # crowded coordinates force overlapping claims and chains
        poses[..., 0] = rng.uniform(0, 60, (p, k))
        poses[..., 1] = rng.uniform(0, 60, (p, k))
        poses[..., 2] = rng.uniform(0.1, 1.0, (p, k))
        poses[..., 3] = rng.uniform(1.0, 12.0, (p, k))
        placed = rng.uniform(size=(p, k)) < 0.7
        valid = rng.uniform(size=p) < 0.9
        seed_f = rng.integers(0, k, size=p).astype(np.int32)
        for pi in range(p):          # the seed joint is always placed
            placed[pi, seed_f[pi]] = True
        placed &= valid[:, None]

        got = np.asarray(nms.seed_claim_suppression(
            jnp.asarray(poses), jnp.asarray(placed), jnp.asarray(valid),
            jnp.asarray(seed_f), image_hw=self.IMAGE_HW,
            config=nms.NMSConfig()))
        want = self.sequential_alive(poses, placed, valid, seed_f)
        np.testing.assert_array_equal(got, want)

    def test_chain_revival(self):
        """A claims B's seed; B (dead) must not claim C's seed."""
        import jax.numpy as jnp

        k = 1
        poses = np.zeros((3, k, 4), np.float32)
        poses[:, 0, 0] = (0.0, 3.0, 9.0)   # x; grid reduction 2, radius 4
        poses[:, 0, 1] = 50.0
        poses[:, 0, 2] = (0.9, 0.8, 0.7)
        poses[:, 0, 3] = 1.0               # radius = max(4, 1) = 4
        placed = np.ones((3, k), bool)
        valid = np.ones(3, bool)
        seed_f = np.zeros(3, np.int32)
        got = np.asarray(nms.seed_claim_suppression(
            jnp.asarray(poses), jnp.asarray(placed), jnp.asarray(valid),
            jnp.asarray(seed_f), image_hw=self.IMAGE_HW,
            config=nms.NMSConfig()))
        want = self.sequential_alive(poses, placed, valid, seed_f)
        np.testing.assert_array_equal(got, want)
        assert got.tolist() == [True, False, True]


def test_iteration_cap_can_miss_deep_chains():
    """Documents why the default is run-to-convergence: a 1-round cap
    reproduces the old fixed-depth behavior and kills C."""
    poses = np.stack([pose_at(0.0, 0.9), pose_at(3.0, 0.8),
                      pose_at(6.0, 0.7)])
    scales = np.ones((3, K), np.float32)
    got, _ = run_both(poses, scales, iterations=1)
    assert (got[2] == 0).all()
