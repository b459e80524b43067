"""Golden end-to-end decode regression (VERDICT r2 next-round item 7).

``tests/fixtures/golden_toykp_fields.npz`` holds the raw CIF/CAF head
outputs of a *trained* checkpoint (toykp sn2k16, eval AP 0.9893) on the
deterministic toykp eval images; ``golden_toykp_poses.json`` the decoded
poses at production defaults.  Any decode-semantics regression — growth
scheduling, occupancy, NMS, scoring — breaks this without retraining
(the reference's golden-output pattern, ``tests/test_predict.py:~20``).

Regenerate deliberately with ``tools/make_golden_fixture.py`` when the
decoder semantics change *on purpose*; the diff review of the json is
the change's evidence.
"""

import json
import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), 'fixtures')


@pytest.fixture(scope='module')
def fixture():
    fields = np.load(os.path.join(FIXTURES, 'golden_toykp_fields.npz'))
    with open(os.path.join(FIXTURES, 'golden_toykp_poses.json')) as f:
        meta = json.load(f)
    return fields, meta


@pytest.fixture(scope='module')
def decoder():
    from openpifpaf_tpu import decoder as decoder_mod, headmeta
    from openpifpaf_tpu.plugins.coco import constants

    cif = headmeta.Cif('cif', 'toykp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'toykp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    cif.head_index, caf.head_index = 0, 1
    cif.base_stride = caf.base_stride = 16
    return decoder_mod.factory([cif, caf])


def test_golden_poses_reproduced(fixture, decoder):
    fields, meta = fixture
    cif_f, caf_f = fields['cif'], fields['caf']
    for i, want_poses in enumerate(meta['poses']):
        anns = decoder([cif_f[i], caf_f[i]])
        assert len(anns) == len(want_poses), f'image {i}: pose count'
        got = sorted(anns, key=lambda a: -a.score)
        for ann, want in zip(got, want_poses):
            want_xyv = np.asarray(want['xyv'], np.float32)
            assert abs(float(ann.score) - want['score']) < 0.01
            vis_w = want_xyv[:, 2] > 0
            vis_g = ann.data[:, 2] > 0
            np.testing.assert_array_equal(vis_g, vis_w,
                                          err_msg=f'image {i} visibility')
            np.testing.assert_allclose(
                ann.data[vis_w, :2], want_xyv[vis_w, :2], atol=1.0,
                err_msg=f'image {i} keypoint positions')
            np.testing.assert_allclose(
                ann.data[vis_w, 2], want_xyv[vis_w, 2], atol=0.02,
                err_msg=f'image {i} confidences')


def test_golden_fields_sane(fixture):
    fields, meta = fixture
    assert fields['cif'].shape[0] == meta['n_images'] == 4
    assert fields['cif'].shape[1:3] == (17, 5)
    assert fields['caf'].shape[1:3] == (19, 9)
    assert np.isfinite(fields['cif']).all()
    assert np.isfinite(fields['caf']).all()
