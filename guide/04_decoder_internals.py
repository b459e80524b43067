"""Guide 4 — On-device decoder, op by op.

The reference's decode chain is sequential C++
(``src/openpifpaf/csrc/src/decoder/cifcaf.cpp:~80``).  Here every stage is
a jittable array op with static shapes; this walk-through runs them one at
a time on synthetic fields so you can see each intermediate.  In
production they are fused into one XLA program per image batch
(``ops/pipeline.py``) — nothing ever leaves the device.

Run: ``python guide/04_decoder_internals.py``.
"""

import jax.numpy as jnp
import numpy as np

from openpifpaf_tpu.ops import caf_scored, cif_hr, growth, nms, seeds

# --- synthetic "predictions": a 2-keypoint pose ---------------------------
# Field grids are (F cells, H, W) at stride 8; a real model emits these from
# its composite-field heads.
F, H, W, STRIDE = 2, 8, 8, 8
kp0 = (24.0, 24.0)   # keypoint type 0 at this pixel
kp1 = (40.0, 24.0)   # keypoint type 1, connected by skeleton edge 0-1

conf = np.zeros((F, H, W), np.float32)
x_px = np.zeros((F, H, W), np.float32)
y_px = np.zeros((F, H, W), np.float32)
scale_px = np.full((F, H, W), 4.0, np.float32)
# like the training targets (and the reference's CifHr normalization, the
# 1/16 neighbor_factor), a keypoint activates a 4x4 cell neighborhood —
# every cell regresses the same exact target position
for f, (x, y) in enumerate((kp0, kp1)):
    ci, cj = int(x / STRIDE), int(y / STRIDE)
    for j in range(cj - 1, cj + 3):
        for i in range(ci - 1, ci + 3):
            conf[f, j, i] = 0.9
            x_px[f, j, i] = x
            y_px[f, j, i] = y

# --- 1. CifHr: high-resolution confidence accumulation --------------------
# Separable-Gaussian splat as an MXU einsum (cif_hr.py docstring).
hr_config = cif_hr.CifHrConfig()
hh, wh = H * STRIDE // hr_config.spacing, W * STRIDE // hr_config.spacing
cifhr = cif_hr.accumulate(jnp.asarray(conf), jnp.asarray(x_px),
                          jnp.asarray(y_px), jnp.asarray(scale_px),
                          out_hw=(hh, wh), config=hr_config)
print('cifhr:', cifhr.shape, 'peak', float(cifhr.max()))

# --- 2. seeds: blended confidence -> masked top-k --------------------------
seed_config = seeds.SeedsConfig(max_seeds=16)
s = seeds.select(jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
                 jnp.asarray(scale_px), cifhr,
                 hr_spacing=float(hr_config.spacing), config=seed_config)
n_seeds = int(s.valid.sum())
print('seeds:', n_seeds, 'best', (int(s.f[0]), float(s.x[0]), float(s.y[0])))

# --- 3. CAF scoring: candidate associations per skeleton edge --------------
# One edge (kp0 <-> kp1); each active CAF cell proposes a directed
# source->target connection, rescored against CifHr at the target.
# CAF components live in feature-cell units (FieldComponents, heads.py).
from openpifpaf_tpu.models.heads import FieldComponents

skeleton = np.array([[0, 1]], np.int32)
E = 1
caf_conf = np.zeros((E, H, W), np.float32)
caf_vec = np.zeros((E, 2, 2, H, W), np.float32)    # (E, endpoint, xy, H, W)
caf_spread = np.ones((E, 2, H, W), np.float32)
caf_scale = np.full((E, 2, H, W), 4.0 / STRIDE, np.float32)
i, j = int(32.0 / STRIDE), int(24.0 / STRIDE)      # midpoint cell
caf_conf[0, j, i] = 0.8
caf_vec[0, 0, 0, j, i] = kp0[0] / STRIDE - i       # offset to endpoint 1
caf_vec[0, 0, 1, j, i] = kp0[1] / STRIDE - j
caf_vec[0, 1, 0, j, i] = kp1[0] / STRIDE - i       # offset to endpoint 2
caf_vec[0, 1, 1, j, i] = kp1[1] / STRIDE - j

caf_config = caf_scored.CafScoredConfig(max_candidates=32)
cand = caf_scored.score(
    FieldComponents(conf=jnp.asarray(caf_conf), vec=jnp.asarray(caf_vec),
                    spread=jnp.asarray(caf_spread),
                    scale=jnp.asarray(caf_scale)),
    cifhr, skeleton, stride=STRIDE,
    hr_spacing=float(hr_config.spacing), config=caf_config)
print('caf candidates per direction:', int(cand.valid[0, 0].sum()),
      int(cand.valid[0, 1].sum()))

# --- 4. growth: data-parallel frontier relaxation ---------------------------
# All poses place their best frontier joint each round (the vectorized
# equivalent of the reference's priority-queue pop), K-1 fixed rounds.
growth_config = growth.GrowthConfig(max_poses=8)
edges = growth.directed_edges(skeleton)
poses, placed, pose_valid, seed_v, _, seed_f = growth.init_poses(
    s, n_keypoints=F, config=growth_config)
poses, placed = growth.grow(poses, placed, pose_valid, cand, edges,
                            growth_config)
print('pose 0 joints:')
for k in range(F):
    print(f'  kp{k}: xy=({float(poses[0, k, 0]):.1f},'
          f' {float(poses[0, k, 1]):.1f}) v={float(poses[0, k, 2]):.2f}')

# --- 5. NMS: vectorized occupancy suppression ------------------------------
nms_config = nms.NMSConfig()
kept_poses, scores, kept = nms.keypoint_nms(
    poses, pose_valid, joint_scales=poses[..., 3],
    score_weights=jnp.ones(F), config=nms_config)
print('poses after nms:', int(kept.sum()), 'score',
      round(float(scores[0]), 3))

assert int(kept.sum()) == 1
assert abs(float(kept_poses[0, 0, 0]) - kp0[0]) < 2.0
assert abs(float(kept_poses[0, 1, 0]) - kp1[0]) < 2.0
print('guide 04 OK')
