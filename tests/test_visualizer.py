"""Visualizer rendering smoke tests (headless, save-to-dir)."""

import matplotlib
import numpy as np
import pytest

matplotlib.use('Agg')

from openpifpaf_tpu import headmeta, visualizer  # noqa: E402
from openpifpaf_tpu.plugins.coco import constants  # noqa: E402


@pytest.fixture(autouse=True)
def _save_dir(tmp_path):
    visualizer.Base.save_dir = str(tmp_path)
    visualizer.Base._save_counter = 0
    yield tmp_path
    visualizer.Base.save_dir = None
    visualizer.Base.set_all_indices([])
    visualizer.Base.reset()


def make_cif_meta():
    meta = headmeta.Cif('cif', 'cocokp',
                        keypoints=constants.COCO_KEYPOINTS,
                        sigmas=constants.COCO_PERSON_SIGMAS)
    meta.base_stride = 16
    return meta


def make_caf_meta():
    meta = headmeta.Caf('caf', 'cocokp',
                        keypoints=constants.COCO_KEYPOINTS,
                        sigmas=constants.COCO_PERSON_SIGMAS,
                        skeleton=constants.COCO_PERSON_SKELETON)
    meta.base_stride = 16
    return meta


def n_saved(tmp_path):
    return len(list(tmp_path.iterdir()))


def test_indices_parsing():
    visualizer.Base.set_all_indices(['cif:5', 'caf:3:confidence', 'seeds'])
    v = visualizer.Cif(make_cif_meta())
    assert v.indices == [5]
    assert v.wanted(5, 'confidence')
    assert not v.wanted(4)


def test_cif_predicted(_save_dir):
    visualizer.Base.set_all_indices(['cif:1'])
    v = visualizer.Cif(make_cif_meta())
    field = np.random.default_rng(0).uniform(0, 1, (17, 5, 9, 9)).astype(
        np.float32)
    v.predicted(field)
    assert n_saved(_save_dir) == 2  # confidence + regression


def test_cif_targets(_save_dir):
    visualizer.Base.set_all_indices(['cif:0'])
    v = visualizer.Cif(make_cif_meta())
    targets = {
        'conf': np.ones((17, 9, 9), np.float32) * 0.5,
        'vec': np.zeros((17, 1, 2, 9, 9), np.float32),
        'scale': np.ones((17, 1, 9, 9), np.float32),
    }
    v.targets(targets)
    assert n_saved(_save_dir) == 2


def test_caf_predicted(_save_dir):
    visualizer.Base.set_all_indices(['caf:2'])
    v = visualizer.Caf(make_caf_meta())
    field = np.random.default_rng(0).uniform(0, 1, (19, 9, 9, 9)).astype(
        np.float32)
    v.predicted(field)
    assert n_saved(_save_dir) == 2


def test_tcaf_predicted(_save_dir):
    visualizer.Base.set_all_indices(['tcaf:2'])
    meta = headmeta.Tcaf('tcaf', 'cocokp',
                         keypoints=constants.COCO_KEYPOINTS,
                         sigmas=constants.COCO_PERSON_SIGMAS)
    meta.base_stride = 16
    v = visualizer.Tcaf(meta)
    field = np.random.default_rng(0).uniform(0, 1, (17, 9, 9, 9)).astype(
        np.float32)
    v.predicted(field)
    assert n_saved(_save_dir) == 2


def test_cifhr_seeds_occupancy(_save_dir):
    visualizer.Base.set_all_indices(['cifhr:0', 'seeds', 'occupancy:0'])
    hr = visualizer.CifHr(make_cif_meta())
    hr.predicted(np.random.default_rng(0).uniform(0, 1, (17, 33, 33)))

    sv = visualizer.Seeds(field_names=constants.COCO_KEYPOINTS)
    seed_array = np.array([[0.9, 0, 10.0, 12.0, 3.0],
                           [0.0, 1, 0.0, 0.0, 0.0]], np.float32)
    sv.predicted(seed_array)

    ov = visualizer.Occupancy(reduction=2)
    ov.predicted(np.zeros((17, 16, 16), bool))
    assert n_saved(_save_dir) == 3


def test_cifdet(_save_dir):
    meta = headmeta.CifDet('cifdet', 'cocodet', categories=['person', 'car'])
    meta.base_stride = 16
    visualizer.Base.set_all_indices(['cifdet:1'])
    v = visualizer.CifDet(meta)
    field = np.random.default_rng(0).uniform(0, 1, (2, 7, 9, 9)).astype(
        np.float32)
    v.predicted(field)
    assert n_saved(_save_dir) == 2


def test_decoder_debug_hook(_save_dir):
    from openpifpaf_tpu import decoder as decoder_mod
    from test_decoder import build_fields, metas, synthetic_pose

    visualizer.Base.set_all_indices(['cif:0', 'caf:0', 'cifhr:0', 'seeds'])
    cif_meta, caf_meta = metas()
    cif_meta.base_stride = 16
    caf_meta.base_stride = 16
    cif_meta.head_index = 0
    caf_meta.head_index = 1
    cif, caf = build_fields([synthetic_pose()])
    dec = decoder_mod.CifCaf(cif_meta, caf_meta)
    anns = dec([cif, caf])
    assert len(anns) >= 1
    # cif conf+reg, caf conf+reg, cifhr, seeds
    assert n_saved(_save_dir) == 6


def test_processed_image_roundtrip():
    img = np.zeros((3, 32, 32), np.float32)
    visualizer.Base.processed_image(img)
    assert visualizer.Base._processed_image.shape == (32, 32, 3)
    visualizer.Base.reset()
    assert visualizer.Base._processed_image is None
