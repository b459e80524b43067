"""CifDet decoder on synthetic fields.

Mirrors the reference's synthetic-field decoder testing strategy
(SURVEY.md §4) for the detection variant
(``src/openpifpaf/csrc/src/decoder/cifdet.cpp:~30``): painted center +
size regressions must decode to the right category, box and score, with
IoU NMS suppressing duplicates.
"""

import numpy as np
import pytest

from openpifpaf_tpu import headmeta
from openpifpaf_tpu.decoder.cifdet import CifDet

from test_decoder import inv_sigmoid

STRIDE = 16


def make_meta(n_categories=2):
    meta = headmeta.CifDet('cifdet', 'test',
                           categories=[f'c{i}' for i in range(n_categories)])
    meta.head_index = 0
    meta.base_stride = STRIDE
    return meta


def paint_det(field, category, cx, cy, w, h, *, conf=0.95):
    """field: (F, 5, H, W) raw; paint a 4x4 neighborhood."""
    _, _, gh, gw = field.shape
    ci, cj = int(cx / STRIDE), int(cy / STRIDE)
    for j in range(cj - 1, cj + 3):
        for i in range(ci - 1, ci + 3):
            if not (0 <= i < gw and 0 <= j < gh):
                continue
            field[category, 0, j, i] = inv_sigmoid(conf)
            field[category, 1, j, i] = cx / STRIDE - i
            field[category, 2, j, i] = cy / STRIDE - j
            field[category, 3, j, i] = w / STRIDE
            field[category, 4, j, i] = h / STRIDE
    return field


def empty_field(n_categories=2, gh=11, gw=11):
    field = np.zeros((n_categories, 5, gh, gw), np.float32)
    field[:, 0] = -10.0
    return field


def test_single_detection():
    field = paint_det(empty_field(), 1, 80.0, 80.0, 40.0, 24.0)
    dec = CifDet(make_meta())
    anns = dec([field])
    assert len(anns) == 1
    ann = anns[0]
    assert ann.category_id == 2  # painted category index 1 -> id 2
    assert ann.score > 0.3
    np.testing.assert_allclose(ann.bbox, [60.0, 68.0, 40.0, 24.0], atol=4.0)


def test_two_categories_same_location():
    field = empty_field()
    paint_det(field, 0, 80.0, 80.0, 30.0, 30.0)
    paint_det(field, 1, 80.0, 80.0, 30.0, 30.0, conf=0.8)
    anns = CifDet(make_meta())([field])
    # per-category NMS: overlapping boxes of different categories both live
    assert sorted(a.category_id for a in anns) == [1, 2]


def test_iou_nms_suppresses_same_category():
    field = empty_field(gh=21, gw=21)
    paint_det(field, 0, 80.0, 80.0, 60.0, 60.0, conf=0.95)
    # nearly identical box a few px away: must be suppressed
    paint_det(field, 0, 88.0, 80.0, 60.0, 60.0, conf=0.7)
    # far-away box of the same category: must survive
    paint_det(field, 0, 240.0, 240.0, 40.0, 40.0, conf=0.9)
    anns = CifDet(make_meta())([field])
    assert len(anns) == 2
    xs = sorted(a.bbox[0] + a.bbox[2] / 2 for a in anns)
    assert abs(xs[0] - 80.0) < 10.0
    assert abs(xs[1] - 240.0) < 10.0


def test_empty_field_no_detections():
    anns = CifDet(make_meta())([empty_field()])
    assert anns == []
