"""Encoder and loss tests, including the encoder->decoder round trip.

The round trip (paint perfect targets from GT -> synthesize raw fields ->
decode -> recover the pose) pins down the coordinate conventions shared by
the encoder, the heads and the decoder.
"""

import numpy as np

from openpifpaf_tpu import encoder, headmeta, losses, ops
from openpifpaf_tpu.annotation import Annotation
from openpifpaf_tpu.plugins.coco import constants


def make_metas(stride=16):
    cif_meta = headmeta.Cif(
        'cif', 'test', keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf_meta = headmeta.Caf(
        'caf', 'test', keypoints=constants.COCO_KEYPOINTS,
        sigmas=constants.COCO_PERSON_SIGMAS,
        skeleton=constants.COCO_PERSON_SKELETON)
    cif_meta.base_stride = stride
    caf_meta.base_stride = stride
    return cif_meta, caf_meta


def make_ann(offset=(0.0, 0.0), scale=30.0):
    pose = constants.COCO_UPRIGHT_POSE
    ann = Annotation(constants.COCO_KEYPOINTS, constants.COCO_PERSON_SKELETON)
    ann.data[:, 0] = pose[:, 0] * scale + 160 + offset[0]
    ann.data[:, 1] = (10.0 - pose[:, 1]) * scale + 10 + offset[1]
    ann.data[:, 2] = 2.0
    return ann


def inv_sigmoid(p):
    p = np.clip(p, 1e-6, 1 - 1e-6)
    return np.log(p / (1 - p))


def inv_softplus(s):
    return np.log(np.expm1(np.maximum(s, 1e-6)))


def targets_to_raw_field(t, n_components):
    """Synthesize a 'perfect prediction' raw field from encoder targets."""
    f, h, w = t['conf'].shape
    nv = t['vec'].shape[1]
    ns = t['scale'].shape[1]
    raw = np.zeros((f, n_components, h, w), np.float32)
    raw[:, 0] = np.where(t['conf'] > 0.5, 8.0, -8.0)
    for v in range(nv):
        raw[:, 1 + 2 * v] = t['vec'][:, v, 0]
        raw[:, 2 + 2 * v] = t['vec'][:, v, 1]
        raw[:, 1 + 2 * nv + v] = inv_softplus(0.5)
    for s in range(ns):
        raw[:, 1 + 3 * nv + s] = np.where(
            t['scale_mask'][:, s], inv_softplus(np.maximum(t['scale'][:, s], 0.1)),
            inv_softplus(0.1))
    return raw


class TestCifEncoder:
    def test_paints_core(self):
        cif_meta, _ = make_metas()
        ann = make_ann()
        image = np.zeros((336, 336, 3), np.float32)
        t = encoder.CifEncoder(cif_meta)(image, [ann])
        assert t['conf'].shape == (17, 21, 21)
        # each keypoint has at least one confident cell at its location
        for f in range(17):
            x, y = ann.data[f, :2] / 16.0
            j, i = int(round(y)), int(round(x))
            assert t['conf'][f, j, i] == 1.0
            # offset from that cell points to the exact keypoint
            assert abs(i + t['vec'][f, 0, 0, j, i] - x) < 1e-5
            assert abs(j + t['vec'][f, 0, 1, j, i] - y) < 1e-5
            assert t['scale'][f, 0, j, i] > 0.0

    def test_crowd_masks_conf(self):
        cif_meta, _ = make_metas()
        crowd = Annotation(constants.COCO_KEYPOINTS,
                           constants.COCO_PERSON_SKELETON)
        crowd.iscrowd = True
        crowd.fixed_bbox = np.array([32.0, 32.0, 64.0, 64.0])
        image = np.zeros((336, 336, 3), np.float32)
        t = encoder.CifEncoder(cif_meta)(image, [crowd])
        assert not t['conf_mask'][:, 3, 3].any()
        assert t['conf_mask'][:, 15, 15].all()


class TestRoundTrip:
    def test_encode_then_decode(self):
        cif_meta, caf_meta = make_metas()
        ann = make_ann()
        image = np.zeros((336, 336, 3), np.float32)
        t_cif = encoder.CifEncoder(cif_meta)(image, [ann])
        t_caf = encoder.CafEncoder(caf_meta)(image, [ann])

        cif_raw = targets_to_raw_field(t_cif, 5)
        caf_raw = targets_to_raw_field(t_caf, 9)

        config = ops.CifCafConfig(stride=16, image_hw=(336, 336))
        result = ops.decode_cifcaf_single(
            cif_raw, caf_raw, cif_meta=cif_meta, caf_meta=caf_meta,
            config=config)
        valid = np.asarray(result.valid)
        assert valid.sum() == 1
        p = int(np.argmax(valid))
        xyv = np.asarray(result.xyv)[p]
        assert (xyv[:, 2] > 0.05).sum() == 17
        err = np.linalg.norm(xyv[:, :2] - ann.data[:, :2], axis=1)
        assert err.max() < 8.0, err


class TestLosses:
    def _setup(self):
        cif_meta, caf_meta = make_metas()
        ann = make_ann()
        image = np.zeros((336, 336, 3), np.float32)
        t_cif = encoder.CifEncoder(cif_meta)(image, [ann])
        t_caf = encoder.CafEncoder(caf_meta)(image, [ann])
        targets = [
            {k: v[None] for k, v in t_cif.items()},
            {k: v[None] for k, v in t_caf.items()},
        ]
        fields = [targets_to_raw_field(t_cif, 5)[None],
                  targets_to_raw_field(t_caf, 9)[None]]
        loss_fn = losses.Factory().factory([cif_meta, caf_meta])
        return loss_fn, fields, targets

    def test_perfect_prediction_low_loss(self):
        loss_fn, fields, targets = self._setup()
        total, comps = loss_fn(fields, targets)
        assert np.isfinite(float(total))
        assert len(comps) == 6
        assert len(loss_fn.field_names) == 6

        # perturb offsets -> regression loss must increase
        bad = [np.copy(f) for f in fields]
        bad[0][:, :, 1:3] += 2.0
        total_bad, comps_bad = loss_fn(bad, targets)
        assert float(comps_bad[1]) > float(comps[1]) + 0.5

        # flip confidence -> conf loss must increase
        bad2 = [np.copy(f) for f in fields]
        bad2[0][:, :, 0] *= -1.0
        _, comps_bad2 = loss_fn(bad2, targets)
        assert float(comps_bad2[0]) > float(comps[0]) + 0.5

    def test_gradients_finite(self):
        import jax
        import jax.numpy as jnp
        loss_fn, fields, targets = self._setup()

        def f(fields_):
            total, _ = loss_fn(fields_, targets)
            return total

        grads = jax.grad(f)([jnp.asarray(x) for x in fields])
        for g in grads:
            assert np.isfinite(np.asarray(g)).all()

    def test_auto_tune_sigmas(self):
        import jax.numpy as jnp
        loss_fn, fields, targets = self._setup()
        sig = jnp.zeros((6,))
        total, _ = loss_fn(fields, targets, log_sigmas=sig)
        assert np.isfinite(float(total))


def test_smooth_l1_regression_analytic():
    import jax.numpy as jnp

    from openpifpaf_tpu.losses import components

    config = components.SmoothL1Config(r_smooth=2.0)
    pred = jnp.array([[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    target = jnp.array([[1.0, 0.0],    # |d|=1 < r: quadratic 0.5/2*1 = 0.25
                        [4.0, 0.0],    # |d|=4 > r: linear 4 - 1 = 3
                        [0.0, 0.0]])   # |d|=0
    out = np.asarray(components.smooth_l1_regression(pred, target, config))
    np.testing.assert_allclose(out, [0.25, 3.0, 0.0], atol=1e-3)

    # r_smooth=0 degenerates to L1
    l1 = components.smooth_l1_regression(
        pred, target, components.SmoothL1Config(r_smooth=0.0))
    np.testing.assert_allclose(np.asarray(l1), [1.0, 4.0, 0.0], atol=1e-3)


def test_composite_loss_smoothl1_selection():
    import jax

    cif_meta = headmeta.Cif('cif', 'toy',
                            keypoints=constants.COCO_KEYPOINTS[:3],
                            sigmas=constants.COCO_PERSON_SIGMAS[:3])
    cif_meta.head_index, cif_meta.base_stride = 0, 16
    config = losses.CompositeLossConfig(regression_loss='smoothl1')
    loss = losses.CompositeLoss(cif_meta, config)

    rng = np.random.default_rng(0)
    field = rng.normal(size=(1, 3, 5, 4, 4)).astype(np.float32)
    target = {
        'conf': np.zeros((1, 3, 4, 4), np.float32),
        'conf_mask': np.ones((1, 3, 4, 4), bool),
        'vec': np.zeros((1, 3, 1, 2, 4, 4), np.float32),
        'vec_mask': np.ones((1, 3, 1, 4, 4), bool),
        'scale': np.ones((1, 3, 1, 4, 4), np.float32),
        'scale_mask': np.ones((1, 3, 1, 4, 4), bool),
    }
    out = loss(jax.numpy.asarray(field), target)
    assert len(out) == 3
    assert all(np.isfinite(np.asarray(v)) for v in out)
