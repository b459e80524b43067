"""Decoder tests on synthetic fields.

Mirrors the reference ``tests/test_decoder.py`` strategy (SURVEY.md §4):
hand-crafted CIF/CAF tensors with known poses -> assert decoded keypoint
locations and scores.  This is the parity harness for the TPU decoder.
"""

import numpy as np
import pytest

from openpifpaf_tpu import headmeta
from openpifpaf_tpu import ops
from openpifpaf_tpu.plugins.coco import constants


def inv_sigmoid(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


def inv_softplus(s):
    return np.log(np.expm1(np.maximum(s, 1e-6)))


def paint_cif(field, kp_xyv_px, scales_px, stride):
    """Paint raw CIF (K, 5, H, W): 4x4 neighborhood per visible keypoint."""
    k, _, h, w = field.shape
    for f in range(k):
        x, y, v = kp_xyv_px[f]
        if v <= 0:
            continue
        cx, cy = x / stride, y / stride
        i0, j0 = int(np.floor(cx)) - 1, int(np.floor(cy)) - 1
        for j in range(j0, j0 + 4):
            for i in range(i0, i0 + 4):
                if not (0 <= i < w and 0 <= j < h):
                    continue
                d = max(abs(cx - i), abs(cy - j))
                conf = 1.0 if d < 1.5 else 0.4
                field[f, 0, j, i] = inv_sigmoid(conf)
                field[f, 1, j, i] = cx - i
                field[f, 2, j, i] = cy - j
                field[f, 3, j, i] = inv_softplus(0.5)
                field[f, 4, j, i] = inv_softplus(scales_px[f] / stride)
    return field


def paint_caf(field, kp_xyv_px, scales_px, skeleton, stride):
    """Paint raw CAF (E, 9, H, W): cells along each edge segment."""
    e_, _, h, w = field.shape
    for e, (a1, a2) in enumerate(skeleton):
        x1, y1, v1 = kp_xyv_px[a1 - 1]
        x2, y2, v2 = kp_xyv_px[a2 - 1]
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
            field[e, 0, j, i] = inv_sigmoid(1.0)
            field[e, 1, j, i] = c1[0] - i
            field[e, 2, j, i] = c1[1] - j
            field[e, 3, j, i] = c2[0] - i
            field[e, 4, j, i] = c2[1] - j
            field[e, 5, j, i] = inv_softplus(0.5)
            field[e, 6, j, i] = inv_softplus(0.5)
            field[e, 7, j, i] = inv_softplus(scales_px[a1 - 1] / stride)
            field[e, 8, j, i] = inv_softplus(scales_px[a2 - 1] / stride)
    return field


def synthetic_pose(offset_px=(0.0, 0.0), scale=30.0):
    """A full 17-keypoint upright pose in a 321x321 image."""
    pose = constants.COCO_UPRIGHT_POSE.copy()
    kp = np.zeros((17, 3), np.float32)
    kp[:, 0] = pose[:, 0] * scale + 160.0 + offset_px[0]
    kp[:, 1] = (10.0 - pose[:, 1]) * scale + 10.0 + offset_px[1]
    kp[:, 2] = 2.0
    scales = np.maximum(4.0, np.asarray(constants.COCO_PERSON_SIGMAS) * scale * 4)
    return kp, scales


def build_fields(poses_and_scales, h=21, w=21, stride=16):
    cif = np.zeros((17, 5, h, w), np.float32)
    caf = np.zeros((19, 9, h, w), np.float32)
    cif[:, 0] = -10.0
    caf[:, 0] = -10.0
    for kp, scales in poses_and_scales:
        paint_cif(cif, kp, scales, stride)
        paint_caf(caf, kp, scales, constants.COCO_PERSON_SKELETON, stride)
    return cif, caf


def metas():
    cif_meta = headmeta.Cif(
        'cif', 'test', keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf_meta = headmeta.Caf(
        'caf', 'test', keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        skeleton=constants.COCO_PERSON_SKELETON)
    return cif_meta, caf_meta


def decode(cif, caf, **config_updates):
    import dataclasses
    cif_meta, caf_meta = metas()
    config = ops.CifCafConfig(
        stride=16, image_hw=(cif.shape[-2] * 16, cif.shape[-1] * 16))
    if config_updates:
        config = dataclasses.replace(config, **config_updates)
    return ops.decode_cifcaf_single(
        np.asarray(cif), np.asarray(caf),
        cif_meta=cif_meta, caf_meta=caf_meta, config=config)


class TestCifHr:
    def test_peak_at_keypoint(self):
        kp, scales = synthetic_pose()
        cif, _ = build_fields([(kp, scales)])
        from openpifpaf_tpu.models.heads import split_fields
        cif_meta, _ = metas()
        comp = split_fields(np.asarray(cif), cif_meta)
        hr = ops.cif_hr.accumulate_from_fields(
            comp, stride=16, out_hw=(168, 168),
            config=ops.cif_hr.CifHrConfig())
        hr = np.asarray(hr)
        # peak of field 0 (nose) near its ground-truth location
        f = 0
        j, i = np.unravel_index(np.argmax(hr[f]), hr[f].shape)
        assert abs(i * 2 - kp[f, 0]) < 6
        assert abs(j * 2 - kp[f, 1]) < 6
        assert hr[f].max() > 0.3
        assert hr[f].max() <= 1.0

    def test_max_active_compaction_exact(self):
        """Top-k cell compaction == dense splat when the budget covers all
        active cells (a painted keypoint activates ~16 cells/field)."""
        import dataclasses
        from openpifpaf_tpu.models.heads import split_fields

        kp, scales = synthetic_pose()
        cif, _ = build_fields([(kp, scales)])
        cif_meta, _ = metas()
        comp = split_fields(np.asarray(cif), cif_meta)

        dense = dataclasses.replace(ops.cif_hr.CifHrConfig(), max_active=0)
        compact = dataclasses.replace(ops.cif_hr.CifHrConfig(), max_active=64)
        hr_dense = np.asarray(ops.cif_hr.accumulate_from_fields(
            comp, stride=16, out_hw=(168, 168), config=dense))
        hr_compact = np.asarray(ops.cif_hr.accumulate_from_fields(
            comp, stride=16, out_hw=(168, 168), config=compact))
        np.testing.assert_allclose(hr_compact, hr_dense, rtol=1e-6, atol=1e-6)

    def test_max_active_truncates_weakest(self):
        """With the budget below the active count, the weakest cells drop:
        the result is bounded by the dense splat and keeps the peak."""
        import dataclasses
        from openpifpaf_tpu.models.heads import split_fields

        kp, scales = synthetic_pose()
        cif, _ = build_fields([(kp, scales)])
        cif_meta, _ = metas()
        comp = split_fields(np.asarray(cif), cif_meta)

        dense = dataclasses.replace(ops.cif_hr.CifHrConfig(), max_active=0)
        tiny = dataclasses.replace(ops.cif_hr.CifHrConfig(), max_active=8)
        hr_dense = np.asarray(ops.cif_hr.accumulate_from_fields(
            comp, stride=16, out_hw=(168, 168), config=dense))
        hr_tiny = np.asarray(ops.cif_hr.accumulate_from_fields(
            comp, stride=16, out_hw=(168, 168), config=tiny))
        assert (hr_tiny <= hr_dense + 1e-6).all()
        f = 0
        j, i = np.unravel_index(np.argmax(hr_tiny[f]), hr_tiny[f].shape)
        assert abs(i * 2 - kp[f, 0]) < 6
        assert abs(j * 2 - kp[f, 1]) < 6

    def test_max_active_overflow_counter(self):
        """The budget has an overflow counter (repo convention): zero when
        everything fits, positive when active cells are dropped."""
        import dataclasses
        from openpifpaf_tpu.models.heads import split_fields

        kp, scales = synthetic_pose()
        cif, _ = build_fields([(kp, scales)])
        cif_meta, _ = metas()
        comp = split_fields(np.asarray(cif), cif_meta)
        import jax.numpy as jnp
        jj = jnp.arange(21, dtype=jnp.float32)[None, :, None]
        ii = jnp.arange(21, dtype=jnp.float32)[None, None, :]
        x_px = (ii + comp.vec[:, 0, 0]) * 16
        y_px = (jj + comp.vec[:, 0, 1]) * 16
        scale_px = comp.scale[:, 0] * 16

        for budget, expect_drop in ((64, False), (8, True)):
            config = dataclasses.replace(ops.cif_hr.CifHrConfig(),
                                         max_active=budget)
            _, dropped = ops.cif_hr.accumulate(
                comp.conf, x_px, y_px, scale_px, out_hw=(168, 168),
                config=config, return_overflow=True)
            assert (int(dropped) > 0) == expect_drop, (budget, int(dropped))


class TestSingle:
    def test_decodes_one_pose(self):
        kp, scales = synthetic_pose()
        cif, caf = build_fields([(kp, scales)])
        result = decode(cif, caf)
        valid = np.asarray(result.valid)
        assert valid.sum() == 1
        p = int(np.argmax(valid))
        xyv = np.asarray(result.xyv)[p]
        n_found = (xyv[:, 2] > 0.05).sum()
        assert n_found == 17
        err = np.linalg.norm(xyv[:, :2] - kp[:, :2], axis=1)
        assert err.max() < 6.0, err
        assert float(np.asarray(result.scores)[p]) > 0.3

    def test_empty_fields(self):
        cif = np.full((17, 5, 21, 21), -10.0, np.float32)
        caf = np.full((19, 9, 21, 21), -10.0, np.float32)
        result = decode(cif, caf)
        assert np.asarray(result.valid).sum() == 0


class TestTwoPeople:
    def test_decodes_two_poses(self):
        kp1, scales = synthetic_pose(offset_px=(-70.0, 0.0))
        kp2, _ = synthetic_pose(offset_px=(75.0, 10.0))
        cif, caf = build_fields([(kp1, scales), (kp2, scales)])
        result = decode(cif, caf)
        valid = np.asarray(result.valid)
        assert valid.sum() == 2
        xyv = np.asarray(result.xyv)[valid]
        # match each decoded pose to its GT by nose position
        noses = xyv[:, 0, :2]
        gt_noses = np.stack([kp1[0, :2], kp2[0, :2]])
        d = np.linalg.norm(noses[:, None] - gt_noses[None], axis=-1)
        assert d.min(axis=1).max() < 6.0


class TestDenseConnections:
    def test_dense_decode(self):
        """Sparse + dense CAF heads decode via --dense-connections."""
        from openpifpaf_tpu.decoder import CifCaf

        cif_meta, caf_meta = metas()
        cif_meta.base_stride = caf_meta.base_stride = 16
        cif_meta.head_index, caf_meta.head_index = 0, 1
        dense_meta = headmeta.Caf(
            'caf25', 'test', keypoints=constants.COCO_KEYPOINTS,
            sigmas=constants.COCO_PERSON_SIGMAS,
            skeleton=constants.DENSER_COCO_PERSON_CONNECTIONS,
            sparse_skeleton=constants.COCO_PERSON_SKELETON)
        dense_meta.base_stride = 16
        dense_meta.head_index = 2

        kp, scales = synthetic_pose()
        cif, caf = build_fields([(kp, scales)])
        dense = np.zeros(
            (len(constants.DENSER_COCO_PERSON_CONNECTIONS), 9, 21, 21),
            np.float32)
        dense[:, 0] = -10.0
        paint_caf(dense, kp, scales,
                  constants.DENSER_COCO_PERSON_CONNECTIONS, 16)

        old = CifCaf.dense_connections
        try:
            CifCaf.dense_connections = 1.0
            dec = CifCaf(cif_meta, caf_meta, dense_caf_meta=dense_meta)
            assert len(dec.caf_meta.skeleton) == 19 + len(
                constants.DENSER_COCO_PERSON_CONNECTIONS)
            anns = dec([cif, caf, dense])
            assert len(anns) == 1
            visible = anns[0].data[:, 2] > 0
            np.testing.assert_allclose(anns[0].data[visible, :2],
                                       kp[visible, :2], atol=3.0)

            # flag off: dense head ignored, plain 19-edge decode
            CifCaf.dense_connections = 0.0
            dec_off = CifCaf(cif_meta, caf_meta, dense_caf_meta=dense_meta)
            assert len(dec_off.caf_meta.skeleton) == 19
            anns_off = dec_off([cif, caf, dense])
            assert len(anns_off) == 1
        finally:
            CifCaf.dense_connections = old


class TestBatch:
    def test_vmapped_decode(self):
        kp, scales = synthetic_pose()
        cif, caf = build_fields([(kp, scales)])
        cif_meta, caf_meta = metas()
        config = ops.CifCafConfig(stride=16, image_hw=(21 * 16, 21 * 16))
        decode_batch = ops.make_batch_decoder(
            cif_meta=cif_meta, caf_meta=caf_meta, config=config)
        cif_b = np.stack([cif, np.full_like(cif, -10.0)])
        caf_b = np.stack([caf, np.full_like(caf, -10.0)])
        result = decode_batch(cif_b, caf_b)
        valid = np.asarray(result.valid)
        assert valid.shape[0] == 2
        assert valid[0].sum() == 1
        assert valid[1].sum() == 0


class TestCrowded:
    def test_nine_pose_grid(self):
        """3x3 grid of people: budgets (seeds, poses, NMS) must hold and
        every person decodes once."""
        # pose at scale 8 occupies x in [144, 176], y in [10, 90]
        offsets = [(dx, dy) for dy in (0.0, 110.0, 220.0)
                   for dx in (-110.0, 0.0, 110.0)]
        poses_in = [synthetic_pose(offset_px=o, scale=8.0) for o in offsets]
        cif, caf = build_fields(poses_in)
        result = decode(cif, caf)
        valid = np.asarray(result.valid)
        assert valid.sum() == 9
        # each decoded pose matches a distinct painted person
        centers = np.array([[160.0 + dx, 50.0 + dy] for dx, dy in offsets])
        xyv = np.asarray(result.xyv)[valid.astype(bool)]
        found = []
        for pose in xyv:
            vis = pose[:, 2] > 0.05
            c = pose[vis, :2].mean(axis=0)
            d = np.linalg.norm(centers - c, axis=1)
            found.append(int(np.argmin(d)))
        assert sorted(found) == list(range(9))


class TestForceComplete:
    """--force-complete-pose: relaxed second growth pass places joints whose
    connections are below the normal keypoint threshold (reference
    cifcaf.cpp:~380), and NMS must not zero them again."""

    @staticmethod
    def weakened_fields():
        kp, scales = synthetic_pose()
        cif, caf = build_fields([(kp, scales)])
        wrists = [9, 10]  # left_wrist, right_wrist (0-based)
        weak_edges = [
            e for e, (a, b) in enumerate(constants.COCO_PERSON_SKELETON)
            if (a - 1) in wrists or (b - 1) in wrists]
        for f in wrists:
            mask = cif[f, 0] > -9.0
            cif[f, 0, mask] = inv_sigmoid(0.1)   # below seed threshold
        for e in weak_edges:
            mask = caf[e, 0] > -9.0
            caf[e, 0, mask] = inv_sigmoid(0.08)  # below keypoint threshold
        return cif, caf, wrists

    def test_default_drops_weak_joints(self):
        cif, caf, wrists = self.weakened_fields()
        result = decode(cif, caf)
        valid = np.asarray(result.valid).astype(bool)
        assert valid.sum() == 1
        pose = np.asarray(result.xyv)[valid][0]
        for f in wrists:
            assert pose[f, 2] == 0.0, f'joint {f} should be below threshold'
        assert (pose[:, 2] > 0).sum() == 15

    def test_force_complete_places_all(self):
        import dataclasses

        from openpifpaf_tpu.ops import caf_scored as caf_mod
        from openpifpaf_tpu.ops import growth as growth_mod
        from openpifpaf_tpu.ops import nms as nms_mod

        cif, caf, wrists = self.weakened_fields()
        kp, _ = synthetic_pose()
        cif_meta, caf_meta = metas()
        config = dataclasses.replace(
            ops.CifCafConfig(
                stride=16, image_hw=(cif.shape[-2] * 16, cif.shape[-1] * 16)),
            caf=dataclasses.replace(caf_mod.CafScoredConfig(),
                                    score_th=0.001),
            growth=dataclasses.replace(growth_mod.GrowthConfig(),
                                       force_complete=True),
            nms=dataclasses.replace(nms_mod.NMSConfig(),
                                    keypoint_threshold=0.0))
        result = ops.decode_cifcaf_single(
            np.asarray(cif), np.asarray(caf),
            cif_meta=cif_meta, caf_meta=caf_meta, config=config)
        valid = np.asarray(result.valid).astype(bool)
        assert valid.sum() == 1
        pose = np.asarray(result.xyv)[valid][0]
        assert (pose[:, 2] > 0).sum() == 17
        for f in wrists:
            assert pose[f, 2] > 0.0
            np.testing.assert_allclose(pose[f, :2], kp[f, :2], atol=8.0)

    def test_decoder_config_relaxes_nms_threshold(self):
        from openpifpaf_tpu import decoder as decoder_pkg

        cif_meta, caf_meta = metas()
        cif_meta.head_index, caf_meta.head_index = 0, 1
        cif_meta.base_stride = caf_meta.base_stride = 16
        dec = decoder_pkg.cifcaf.CifCaf(cif_meta, caf_meta)
        assert dec.config_for((321, 321)).nms.keypoint_threshold > 0.0
        dec.force_complete = True
        assert dec.config_for((321, 321)).nms.keypoint_threshold == 0.0

    def test_first_pass_keeps_normal_threshold(self):
        """--force-complete-pose must not relax the FIRST pass's candidate
        set: the relaxed candidates live in a separate caf_fc set with a
        doubled budget (reference relaxes only the second pass,
        cifcaf.cpp:~380)."""
        from openpifpaf_tpu import decoder as decoder_pkg

        cif_meta, caf_meta = metas()
        cif_meta.head_index, caf_meta.head_index = 0, 1
        cif_meta.base_stride = caf_meta.base_stride = 16
        dec = decoder_pkg.cifcaf.CifCaf(cif_meta, caf_meta)
        config = dec.config_for((321, 321))
        assert config.caf.score_th == dec.caf_score_th
        assert config.caf_fc is None
        dec.force_complete = True
        config = dec.config_for((321, 321))
        assert config.caf.score_th == dec.caf_score_th
        assert config.caf_fc is not None
        assert config.caf_fc.score_th == dec.force_complete_caf_th
        assert config.caf_fc.max_candidates == 2 * config.caf.max_candidates

    def test_force_complete_via_separate_candidate_set(self):
        """End-to-end: first pass at the normal CAF threshold, relaxed
        candidates only in caf_fc — the weak wrist edges are still placed
        by the second pass."""
        import dataclasses

        from openpifpaf_tpu.ops import caf_scored as caf_mod
        from openpifpaf_tpu.ops import growth as growth_mod
        from openpifpaf_tpu.ops import nms as nms_mod

        cif, caf, wrists = self.weakened_fields()
        kp, _ = synthetic_pose()
        cif_meta, caf_meta = metas()
        config = dataclasses.replace(
            ops.CifCafConfig(
                stride=16, image_hw=(cif.shape[-2] * 16, cif.shape[-1] * 16)),
            caf_fc=dataclasses.replace(caf_mod.CafScoredConfig(),
                                       score_th=0.001, max_candidates=512),
            growth=dataclasses.replace(growth_mod.GrowthConfig(),
                                       force_complete=True),
            nms=dataclasses.replace(nms_mod.NMSConfig(),
                                    keypoint_threshold=0.0))
        assert config.caf.score_th == pytest.approx(0.2)
        result = ops.decode_cifcaf_single(
            np.asarray(cif), np.asarray(caf),
            cif_meta=cif_meta, caf_meta=caf_meta, config=config)
        valid = np.asarray(result.valid).astype(bool)
        assert valid.sum() == 1
        pose = np.asarray(result.xyv)[valid][0]
        assert (pose[:, 2] > 0).sum() == 17
        for f in wrists:
            assert pose[f, 2] > 0.0
            np.testing.assert_allclose(pose[f, :2], kp[f, :2], atol=8.0)


class TestGrowthVariants:
    """Alternative connection strategies decode the same clean pose:
    --connection-method=max and --no-reverse-match (reference
    cifcaf.cpp:~220..~330 grow_connection_blend/max paths)."""

    @staticmethod
    def run_variant(**growth_updates):
        import dataclasses

        from openpifpaf_tpu.ops import growth as growth_mod

        kp, scales = synthetic_pose()
        cif, caf = build_fields([(kp, scales)])
        result = decode(
            cif, caf,
            growth=dataclasses.replace(growth_mod.GrowthConfig(),
                                       **growth_updates))
        valid = np.asarray(result.valid).astype(bool)
        assert valid.sum() == 1
        pose = np.asarray(result.xyv)[valid][0]
        assert (pose[:, 2] > 0).sum() == 17
        np.testing.assert_allclose(pose[:, :2], kp[:, :2], atol=8.0)

    def test_connection_max(self):
        self.run_variant(connection_blend=False)

    def test_no_reverse_match(self):
        self.run_variant(reverse_match=False)
