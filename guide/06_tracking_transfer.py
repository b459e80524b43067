"""Guide 6 — Tracking models and transfer learning.

Mirrors the reference's tracking workflow (``network/tracking_base.py``,
``guide`` tracking docs): pose tracking uses a frame-pair model — the same
backbone runs both frames (folded into the batch axis to keep the MXU
saturated), single-frame heads (CIF/CAF) see each frame, and the temporal
TCAF head sees channel-concatenated features to associate keypoints across
frames.  The training recipe warm-starts from a single-frame checkpoint:
pass ``--checkpoint single_frame.npz`` with a tracking ``--dataset`` and
the factory transfers the backbone and the CIF/CAF heads, initializing
only TCAF fresh.

Run: ``python guide/06_tracking_transfer.py``.
"""

import tempfile

import jax
import numpy as np

from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.models.tracking_base import TrackingModel
from openpifpaf_tpu.plugins.coco import constants
from openpifpaf_tpu.plugins.posetrack.cocokpst import tracking_head_metas

# --- 1. a single-frame model (stand-in for a trained checkpoint) -----------
cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   pose=constants.COCO_UPRIGHT_POSE,
                   draw_skeleton=constants.COCO_PERSON_SKELETON,
                   score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   pose=constants.COCO_UPRIGHT_POSE,
                   skeleton=constants.COCO_PERSON_SKELETON)
factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
single = factory.from_scratch('shufflenetv2k16', [cif, caf])
single.init(jax.random.key(0), input_hw=(65, 65))
ckpt = tempfile.mkdtemp(prefix='guide06_') + '/single.npz'
models.checkpoint.save(
    ckpt, variables=jax.tree.map(np.asarray, single.variables),
    head_metas=single.head_metas, basenet_name='shufflenetv2k16',
    base_stride=16)

# --- 2. transfer to a tracking model ---------------------------------------
metas = tracking_head_metas(
    'posetrack2018', keypoints=constants.COCO_KEYPOINTS,
    sigmas=constants.COCO_PERSON_SIGMAS, pose=constants.COCO_UPRIGHT_POSE,
    skeleton=constants.COCO_PERSON_SKELETON,
    score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
tracking = models.Factory(checkpoint=ckpt, bf16=False).factory(
    head_metas=metas, rng=jax.random.key(1))
assert isinstance(tracking, TrackingModel)
print('heads:', [m.name for m in tracking.head_metas])

# --- 3. frame-pair forward ---------------------------------------------------
# input layout: (2B, H, W, 3), pairs adjacent (prev, curr, prev, curr, ...)
rng = np.random.default_rng(0)
pair = rng.normal(size=(2, 65, 65, 3)).astype(np.float32)
fields = jax.jit(
    lambda v, x: tracking.module.apply(v, x, train=False)
)(tracking.variables, pair)
for meta, f in zip(tracking.head_metas, fields):
    print(f'{meta.name}: {f.shape}'
          + ('  (per frame)' if f.shape[0] == 2 else '  (per pair)'))
# cif/caf: (2, F, 5|9, h, w) both frames; tcaf: (1, F, 9, h, w) per pair
assert fields[0].shape[0] == 2
assert fields[2].shape[0] == 1

# --- 4. video streaming ------------------------------------------------------
# The video CLI caches the previous frame's backbone features and runs the
# backbone only on the new frame:
#   python -m openpifpaf_tpu.video --source frames/ \
#       --checkpoint tracking.npz --json-output tracks.jsonl
print('guide 06 OK')
