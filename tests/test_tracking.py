"""Tracking stack tests: TCAF ops, TrackingPose ids, PoseSimilarity,
tracking model + encoders (synthetic data, mirrors reference test strategy
for the posetrack plugin)."""

import numpy as np
import pytest

import jax

from openpifpaf_tpu import headmeta
from openpifpaf_tpu.ops import TrackingConfig, tracking as tracking_ops
from openpifpaf_tpu.plugins.coco import constants

from test_decoder import (build_fields, inv_sigmoid, inv_softplus, metas,
                          paint_cif, synthetic_pose)


def paint_tcaf(field, kp1_xyv_px, kp2_xyv_px, scales_px, stride):
    """Paint raw TCAF (K, 9, H, W): vec0 -> frame1 pos, vec1 -> frame2 pos."""
    k, _, h, w = field.shape
    for f in range(k):
        x1, y1, v1 = kp1_xyv_px[f]
        x2, y2, v2 = kp2_xyv_px[f]
        if v1 <= 0 or v2 <= 0:
            continue
        c1 = np.array([x1, y1]) / stride
        c2 = np.array([x2, y2]) / stride
        n_steps = max(2, int(np.ceil(np.linalg.norm(c2 - c1))) + 1)
        for t in np.linspace(0.0, 1.0, n_steps):
            p = c1 + t * (c2 - c1)
            i, j = int(round(p[0])), int(round(p[1]))
            if not (0 <= i < w and 0 <= j < h):
                continue
            field[f, 0, j, i] = inv_sigmoid(1.0)
            field[f, 1, j, i] = c1[0] - i
            field[f, 2, j, i] = c1[1] - j
            field[f, 3, j, i] = c2[0] - i
            field[f, 4, j, i] = c2[1] - j
            field[f, 5, j, i] = inv_softplus(0.5)
            field[f, 6, j, i] = inv_softplus(0.5)
            field[f, 7, j, i] = inv_softplus(scales_px[f] / stride)
            field[f, 8, j, i] = inv_softplus(scales_px[f] / stride)
    return field


def tcaf_meta():
    meta = headmeta.Tcaf('tcaf', 'test',
                         keypoints_single_frame=constants.COCO_KEYPOINTS,
                         sigmas_single_frame=constants.COCO_PERSON_SIGMAS)
    meta.base_stride = 16
    meta.head_index = 2
    return meta


class TestGreedyMatch:
    def test_simple(self):
        scores = np.array([[0.9, 0.1], [0.2, 0.8]], np.float32)
        match = np.asarray(tracking_ops.greedy_match(scores, 0.05))
        assert match.tolist() == [0, 1]

    def test_crossed(self):
        scores = np.array([[0.1, 0.9], [0.8, 0.2]], np.float32)
        match = np.asarray(tracking_ops.greedy_match(scores, 0.05))
        assert match.tolist() == [1, 0]

    def test_threshold(self):
        scores = np.array([[0.9, 0.0], [0.0, 0.01]], np.float32)
        match = np.asarray(tracking_ops.greedy_match(scores, 0.05))
        assert match.tolist() == [0, -1]

    def test_one_to_one(self):
        # both current poses prefer previous pose 0; only one can get it
        scores = np.array([[0.9, 0.8]], np.float32)
        match = np.asarray(tracking_ops.greedy_match(scores, 0.05))
        assert sorted(match.tolist()) == [-1, 0]


class TestAssociator:
    def test_links_shifted_pose(self):
        stride = 16
        kp1, scales = synthetic_pose()
        kp2 = kp1.copy()
        kp2[:, 0] += 24.0  # camera pan right

        tcaf_field = np.zeros((17, 9, 21, 21), np.float32)
        tcaf_field[:, 0] = -10.0
        paint_tcaf(tcaf_field, kp1, kp2, scales, stride)

        meta = tcaf_meta()
        associate = tracking_ops.make_associator(
            tcaf_meta=meta, config=TrackingConfig())

        max_poses = 4
        prev = np.zeros((max_poses, 17, 3), np.float32)
        prev[0] = kp1
        prev_valid = np.zeros(max_poses, np.float32)
        prev_valid[0] = 1.0
        curr = np.zeros((max_poses, 17, 3), np.float32)
        curr[1] = kp2  # different slot on purpose
        curr_valid = np.zeros(max_poses, np.float32)
        curr_valid[1] = 1.0

        match, n_dropped = associate(tcaf_field, prev, prev_valid,
                                     curr, curr_valid)
        match = np.asarray(match)
        assert match[1] == 0
        assert match[0] == -1

    def test_no_link_for_distant_pose(self):
        stride = 16
        kp1, scales = synthetic_pose()
        kp2 = kp1.copy()
        kp2[:, 0] += 24.0

        tcaf_field = np.zeros((17, 9, 21, 21), np.float32)
        tcaf_field[:, 0] = -10.0
        paint_tcaf(tcaf_field, kp1, kp2, scales, stride)

        meta = tcaf_meta()
        associate = tracking_ops.make_associator(
            tcaf_meta=meta, config=TrackingConfig())

        far = kp1.copy()
        far[:, 0] += 150.0
        prev = np.stack([far, np.zeros_like(far)])
        prev_valid = np.array([1.0, 0.0], np.float32)
        curr = np.stack([kp2, np.zeros_like(kp2)])
        curr_valid = np.array([1.0, 0.0], np.float32)
        match, _ = associate(tcaf_field, prev, prev_valid, curr, curr_valid)
        assert np.asarray(match)[0] == -1


class TestTrackingPose:
    def make_decoder(self):
        from openpifpaf_tpu.decoder import TrackingPose

        cif_meta, caf_meta = metas()
        cif_meta.base_stride = caf_meta.base_stride = 16
        cif_meta.head_index, caf_meta.head_index = 0, 1
        return TrackingPose(cif_meta, caf_meta, tcaf_meta())

    def pair_fields(self, kp1, kp2, scales):
        cif1, caf1 = build_fields([(kp1, scales)])
        cif2, caf2 = build_fields([(kp2, scales)])
        tcaf_field = np.zeros((17, 9, 21, 21), np.float32)
        tcaf_field[:, 0] = -10.0
        paint_tcaf(tcaf_field, kp1, kp2, scales, 16)
        return [np.stack([cif1, cif2]), np.stack([caf1, caf2]), tcaf_field]

    def test_tcaf_debug_view(self, tmp_path):
        """--debug-indices tcaf:N renders the temporal association view
        from inside the tracking decode (visualizer/tcaf.py)."""
        import matplotlib

        matplotlib.use('Agg')
        from openpifpaf_tpu import visualizer

        dec = self.make_decoder()
        kp1, scales = synthetic_pose()
        kp2 = kp1.copy()
        kp2[:, 0] += 24.0

        visualizer.Base.save_dir = str(tmp_path)
        visualizer.Base._save_counter = 0
        visualizer.Base.set_all_indices(['tcaf:2'])
        try:
            dec(self.pair_fields(kp1, kp2, scales))
        finally:
            visualizer.Base.save_dir = None
            visualizer.Base.set_all_indices([])
            visualizer.Base.reset()
        assert len(list(tmp_path.iterdir())) == 2   # confidence + arrows

    def test_id_persists(self):
        dec = self.make_decoder()
        kp1, scales = synthetic_pose()
        kp2 = kp1.copy()
        kp2[:, 0] += 24.0

        anns = dec(self.pair_fields(kp1, kp2, scales))
        assert len(anns) == 1
        first_id = anns[0].id_
        assert first_id >= 1

        # next frame pair: continues the motion
        kp3 = kp2.copy()
        kp3[:, 0] += 16.0
        anns2 = dec(self.pair_fields(kp2, kp3, scales))
        assert len(anns2) == 1
        assert anns2[0].id_ == first_id

    def test_new_pose_gets_new_id(self):
        dec = self.make_decoder()
        kp1, scales = synthetic_pose()
        kp2 = kp1.copy()
        kp2[:, 0] += 24.0
        anns = dec(self.pair_fields(kp1, kp2, scales))
        first_id = anns[0].id_

        # a pose at a new location with no tcaf support
        kp_new, _ = synthetic_pose(offset_px=(-100.0, 0.0))
        fields = self.pair_fields(kp_new, kp_new, scales)
        # erase tcaf so no association is possible
        fields[2] = np.zeros_like(fields[2])
        fields[2][:, 0] = -10.0
        dec.frame_number = 1  # not a fresh start
        anns2 = dec(fields)
        assert len(anns2) == 1
        assert anns2[0].id_ != first_id


class TestPoseSimilarity:
    def test_oks_tracking(self):
        from openpifpaf_tpu.decoder import PoseSimilarity

        cif_meta, caf_meta = metas()
        cif_meta.base_stride = caf_meta.base_stride = 16
        cif_meta.head_index, caf_meta.head_index = 0, 1
        dec = PoseSimilarity(cif_meta, caf_meta)

        kp1, scales = synthetic_pose()
        anns1 = dec(list(build_fields([(kp1, scales)])))
        assert len(anns1) == 1
        tid = anns1[0].id_
        assert tid >= 1

        kp2 = kp1.copy()
        kp2[:, 0] += 10.0
        anns2 = dec(list(build_fields([(kp2, scales)])))
        assert len(anns2) == 1
        assert anns2[0].id_ == tid


class TestTrackingModelTrain:
    def test_loss_and_decode(self):
        from openpifpaf_tpu import datasets, losses, models
        from openpifpaf_tpu import decoder as decoder_mod
        import jax.numpy as jnp

        dm = datasets.factory('toykpst')
        type(dm).n_images = 4
        type(dm).image_size = 81
        type(dm).batch_size = 2
        model = models.Factory(base_name='shufflenetv2k16',
                               bf16=False).factory(
            head_metas=dm.head_metas, rng=jax.random.key(0))
        images, targets, _ = next(iter(dm.train_loader()))
        assert images.shape[0] == 4  # 2 pairs interleaved

        outs = model(images)
        assert outs[0].shape[0] == 4
        assert outs[2].shape[0] == 2

        loss_fn = losses.Factory().factory(model.head_metas)
        total, components = loss_fn([jnp.asarray(o) for o in outs], targets)
        assert np.isfinite(float(total))
        assert len(components) == 9

        dec = decoder_mod.factory(model.head_metas)
        from openpifpaf_tpu.decoder import TrackingPose
        assert isinstance(dec, TrackingPose)
        preds = dec.batch_fields(outs)
        assert len(preds) == 2


class TestSequenceSegmentation(TestTrackingPose):
    """TrackingPose must drop track memory at sequence boundaries: an
    independent eval pair's current frame must never be associated
    against the previous item's poses (a different image)."""

    def test_new_sequence_resets_tracks(self):
        dec = self.make_decoder()
        kp1, scales = synthetic_pose()
        kp2 = kp1.copy()
        kp2[:, 0] += 6.0

        anns_a = dec(self.pair_fields(kp1, kp2, scales),
                     meta={'sequence_id': 'img0'})
        assert len(anns_a) == 1
        frame_number_after_a = dec.frame_number

        # same pair again as a NEW sequence: fresh track ids, fresh state
        anns_b = dec(self.pair_fields(kp1, kp2, scales),
                     meta={'sequence_id': 'img1'})
        assert len(anns_b) == 1
        assert anns_b[0].id_ != anns_a[0].id_      # ids unique across seqs
        assert dec.frame_number <= frame_number_after_a

        # same sequence continuing: id persists
        anns_c = dec(self.pair_fields(kp2, kp2, scales),
                     meta={'sequence_id': 'img1'})
        assert len(anns_c) == 1
        assert anns_c[0].id_ == anns_b[0].id_


def test_tracking_apply_fast_matches_baseline():
    """TrackingModel.apply_fast must honor the paired TCAF head: the
    generic shell fast path would feed single-frame features to the
    channel-concatenated head (it raised a shape error before the r4
    override); the tracking override runs the fused backbone and the
    tracking-shell head dispatch, matching the baseline apply."""
    import jax
    import numpy as np

    from openpifpaf_tpu import models
    from openpifpaf_tpu.plugins.posetrack.cocokpst import tracking_head_metas
    from openpifpaf_tpu.plugins.coco import constants

    head_metas = tracking_head_metas(
        'cocokpst', keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        pose=constants.COCO_UPRIGHT_POSE,
        skeleton=constants.COCO_PERSON_SKELETON,
        score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    model = models.Factory(base_name='tshufflenetv2k16',
                           bf16=False).from_scratch('tshufflenetv2k16',
                                                    head_metas)
    model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 81, 81, 3)).astype(np.float32)
    base = jax.jit(lambda v, xx: model.module.apply(v, xx, train=False))(
        model.variables, x)
    fast = jax.jit(lambda v, xx: model.apply_fast(v, xx))(model.variables, x)
    assert len(base) == len(fast)
    for b, f in zip(base, fast):
        np.testing.assert_allclose(np.asarray(f), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
