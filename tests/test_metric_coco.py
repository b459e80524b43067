"""Native COCO evaluation (metric/cocoeval.py) against hand-computed values.

pycocotools is unavailable in this environment (the usual oracle —
reference ``src/openpifpaf/metric/coco.py:~20`` wraps it), so these tests
pin the protocol to analytically-derived AP/AR values: greedy score-order
matching, 101-point interpolated precision, crowd and area-range ignores.
"""

import json

import numpy as np
import pytest

from openpifpaf_tpu import metric
from openpifpaf_tpu.metric.cocoeval import (CocoEval, DtInstance, GtInstance,
                                            bbox_iou, oks)

SIGMAS = np.array([0.1, 0.1, 0.1])


def kp_gt(x, y, *, spread=20.0, area=5000.0, iscrowd=False):
    """3-keypoint GT instance: a vertical line of keypoints at (x, y)."""
    kps = np.array([[x, y, 2], [x, y + spread, 2], [x, y + 2 * spread, 2]],
                   np.float32)
    w = h = np.sqrt(area)
    return GtInstance(keypoints=kps, bbox=np.array([x, y, w, h], np.float32),
                      area=area, iscrowd=iscrowd)


def kp_dt(x, y, *, spread=20.0, score=0.9):
    kps = np.array([[x, y, 2], [x, y + spread, 2], [x, y + 2 * spread, 2]],
                   np.float32)
    return DtInstance(keypoints=kps, bbox=np.zeros(4, np.float32),
                      score=score)


def kp_eval(images):
    ev = CocoEval(iou_type='keypoints', sigmas=SIGMAS, max_dets=20)
    for image_id, (dts, gts) in enumerate(images):
        ev.add_image(image_id, dts, gts)
    return ev.summarize()


class TestOks:
    def test_exact_match_is_one(self):
        gt = kp_gt(50, 50)
        assert oks(gt.keypoints, gt, SIGMAS) == pytest.approx(1.0)

    def test_distance_decay(self):
        gt = kp_gt(50, 50)
        dt = kp_dt(53, 50).keypoints
        # e = d^2 / (2s)^2 / area / 2 per keypoint, averaged exp(-e)
        e = 9.0 / (2 * 0.1) ** 2 / (5000.0 + np.spacing(1)) / 2.0
        assert oks(dt, gt, SIGMAS) == pytest.approx(np.exp(-e), rel=1e-6)

    def test_unlabeled_gt_uses_expanded_bbox(self):
        gt = GtInstance(
            keypoints=np.array([[50, 50, 0], [50, 70, 0], [50, 90, 0]],
                               np.float32),
            bbox=np.array([40, 40, 20, 20], np.float32),
            area=400.0, iscrowd=False)
        inside = np.array([[45, 45, 2], [50, 50, 2], [55, 55, 2]], np.float32)
        # within the 3x-expanded box: zero distance -> oks 1
        assert oks(inside, gt, SIGMAS) == pytest.approx(1.0)
        far = inside + np.array([200.0, 0.0, 0.0])
        assert oks(far, gt, SIGMAS) < 0.1


def test_bbox_iou():
    gt = GtInstance(keypoints=None, bbox=np.array([0, 0, 10, 10], np.float32),
                    area=100.0, iscrowd=False)
    assert bbox_iou(np.array([0, 0, 10, 10], np.float32), gt) \
        == pytest.approx(1.0)
    assert bbox_iou(np.array([0, 0, 10, 5], np.float32), gt) \
        == pytest.approx(0.5)
    # crowd: union is the detection area only
    crowd = GtInstance(keypoints=None,
                       bbox=np.array([0, 0, 100, 100], np.float32),
                       area=10000.0, iscrowd=True)
    assert bbox_iou(np.array([0, 0, 10, 10], np.float32), crowd) \
        == pytest.approx(1.0)


class TestKeypointAp:
    def test_perfect(self):
        gt = kp_gt(50, 50)
        res = kp_eval([([kp_dt(50, 50)], [gt])])
        assert res['AP'] == pytest.approx(1.0)
        assert res['AR'] == pytest.approx(1.0)
        assert res['AP0.5'] == pytest.approx(1.0)
        assert res['AP0.75'] == pytest.approx(1.0)

    def test_missed_gt_halves_recall(self):
        # 2 GTs, 1 perfect DT: recall 0.5 at precision 1 ->
        # 101-pt AP = 51/101 (thresholds 0.00..0.50 take precision 1.0)
        gts = [kp_gt(50, 50), kp_gt(300, 50)]
        res = kp_eval([([kp_dt(50, 50)], gts)])
        assert res['AP'] == pytest.approx(51.0 / 101.0)
        assert res['AR'] == pytest.approx(0.5)

    def test_low_score_fp_after_tp_keeps_ap(self):
        # precision reaches 1.0 at recall 1.0 before the trailing FP
        gt = kp_gt(50, 50)
        dts = [kp_dt(50, 50, score=0.9), kp_dt(400, 400, score=0.3)]
        res = kp_eval([(dts, [gt])])
        assert res['AP'] == pytest.approx(1.0)

    def test_high_score_fp_before_tp_halves_ap(self):
        gt = kp_gt(50, 50)
        dts = [kp_dt(400, 400, score=0.95), kp_dt(50, 50, score=0.5)]
        res = kp_eval([(dts, [gt])])
        assert res['AP'] == pytest.approx(0.5)

    def test_crowd_match_not_a_false_positive(self):
        gt = kp_gt(50, 50)
        crowd = kp_gt(300, 50, iscrowd=True)
        dts = [kp_dt(300, 50, score=0.95),  # on the crowd: ignored
               kp_dt(50, 50, score=0.5)]
        res = kp_eval([(dts, [gt, crowd])])
        assert res['AP'] == pytest.approx(1.0)

    def test_unlabeled_gt_is_ignored(self):
        gt = kp_gt(50, 50)
        unlabeled = kp_gt(300, 50)
        unlabeled.keypoints[:, 2] = 0
        dts = [kp_dt(300, 50, score=0.95),  # matches the ignored gt
               kp_dt(50, 50, score=0.5)]
        res = kp_eval([(dts, [gt, unlabeled])])
        assert res['AP'] == pytest.approx(1.0)

    def test_area_ranges(self):
        # medium gt (area 5000 in [32^2, 96^2]) only: APL has no gts -> -1
        gt = kp_gt(50, 50, area=5000.0)
        res = kp_eval([([kp_dt(50, 50)], [gt])])
        assert res['APM'] == pytest.approx(1.0)
        assert res['APL'] == -1.0

    def test_out_of_range_unmatched_dt_is_ignored(self):
        # a leading spurious detection with tiny extent must not count as a
        # false positive for the large area range (pycocotools dtIg rule)
        gt = kp_gt(50, 50, spread=120.0, area=20000.0)  # large
        tiny_fp = kp_dt(400, 400, spread=1.0, score=0.95)
        dts = [tiny_fp, kp_dt(50, 50, spread=120.0, score=0.5)]
        res = kp_eval([(dts, [gt])])
        assert res['APL'] == pytest.approx(1.0)
        assert res['AP'] == pytest.approx(0.5)  # 'all' keeps the FP

    def test_multi_image_score_pooling(self):
        # image A: perfect TP at 0.9; image B: FP at 0.95 + missed gt.
        # pooled order: FP(0.95), TP(0.9) -> precision [0, 0.5],
        # recall [0, 0.5] of 2 gts -> AP = 0.5 * 51/101
        a = ([kp_dt(50, 50, score=0.9)], [kp_gt(50, 50)])
        b = ([kp_dt(400, 400, score=0.95)], [kp_gt(50, 50)])
        res = kp_eval([a, b])
        assert res['AP'] == pytest.approx(0.5 * 51.0 / 101.0)

    def test_max_dets_cap(self):
        gt = kp_gt(50, 50)
        dts = [kp_dt(400 + 10 * i, 400, score=0.99 - 0.001 * i)
               for i in range(25)] + [kp_dt(50, 50, score=0.1)]
        ev = CocoEval(iou_type='keypoints', sigmas=SIGMAS, max_dets=20)
        ev.add_image(0, dts, [gt])
        res = ev.summarize()
        # the only TP is cut by the 20-detection cap
        assert res['AP'] == pytest.approx(0.0)


def test_bbox_ap():
    gt = GtInstance(keypoints=None, bbox=np.array([0, 0, 50, 50], np.float32),
                    area=2500.0, iscrowd=False)
    dt = DtInstance(keypoints=None, bbox=np.array([0, 0, 50, 50], np.float32),
                    score=0.9)
    ev = CocoEval(iou_type='bbox', sigmas=None, max_dets=20)
    ev.add_image(0, [dt], [gt])
    res = ev.summarize()
    assert res['AP'] == pytest.approx(1.0)
    # iou 0.5 box matches only the first threshold
    half = DtInstance(keypoints=None,
                      bbox=np.array([0, 0, 50, 25], np.float32), score=0.9)
    ev2 = CocoEval(iou_type='bbox', sigmas=None, max_dets=20)
    ev2.add_image(0, [half], [gt])
    res2 = ev2.summarize()
    assert res2['AP0.5'] == pytest.approx(1.0)
    assert res2['AP'] == pytest.approx(0.1)


def test_coco_wrapper_with_ann_file(tmp_path):
    from openpifpaf_tpu.metric.coco import Coco

    kps = [50.0, 50.0, 2, 50.0, 70.0, 2, 50.0, 90.0, 2]
    ann_file = tmp_path / 'gt.json'
    ann_file.write_text(json.dumps({
        'annotations': [{'image_id': 7, 'category_id': 1, 'keypoints': kps,
                         'bbox': [40, 40, 70, 70], 'area': 4900.0,
                         'iscrowd': 0}],
    }))
    metric = Coco(ann_file=str(ann_file), iou_type='keypoints',
                  keypoint_oks_sigmas=SIGMAS)
    metric.accumulate(
        [{'keypoints': kps, 'score': 0.9, 'category_id': 1}],
        {'image_id': 7})
    stats = metric.stats()
    assert stats['text_labels'][0] == 'AP'
    assert len(stats['stats']) == len(stats['text_labels']) == 10
    assert stats['stats'][0] == pytest.approx(1.0)
    assert stats['n_images'] == 1
    assert metric.predictions_json()[0]['image_id'] == 7


class TestCrowdIndexGroups:
    """crowdposetools protocol: AP broken down by per-image crowd-index
    band (easy < 0.1 <= medium < 0.8 <= hard) instead of instance area."""

    @staticmethod
    def _ann_file(tmp_path):
        import json

        def kp(x, y):
            return [x, y, 2.0, x, y + 30.0, 2.0, x, y + 60.0, 2.0]

        data = {
            'images': [
                {'id': 1, 'crowdIndex': 0.05},   # easy
                {'id': 2, 'crowdIndex': 0.5},    # medium
                {'id': 3, 'crowdIndex': 0.9},    # hard
            ],
            'annotations': [
                {'id': 10, 'image_id': 1, 'category_id': 1,
                 'keypoints': kp(50, 50), 'bbox': [40, 40, 60, 80],
                 'area': 4800, 'iscrowd': 0},
                {'id': 11, 'image_id': 2, 'category_id': 1,
                 'keypoints': kp(80, 60), 'bbox': [70, 50, 60, 80],
                 'area': 4800, 'iscrowd': 0},
                {'id': 12, 'image_id': 3, 'category_id': 1,
                 'keypoints': kp(90, 90), 'bbox': [80, 80, 60, 80],
                 'area': 4800, 'iscrowd': 0},
            ],
        }
        path = tmp_path / 'crowdpose.json'
        with open(path, 'w') as f:
            json.dump(data, f)
        return str(path)

    def test_group_breakdown(self, tmp_path):
        sigmas = [0.1, 0.1, 0.1]
        m = metric.Coco(ann_file=self._ann_file(tmp_path),
                        iou_type='keypoints', keypoint_oks_sigmas=sigmas,
                        crowd_index_groups=True)
        assert m.text_labels == ['AP', 'AP0.5', 'AP0.75', 'APE', 'APM',
                                 'APH', 'AR', 'AR0.5', 'AR0.75']

        def pred(x, y, score=0.9):
            return {'keypoints': [x, y, 2.0, x, y + 30.0, 2.0,
                                  x, y + 60.0, 2.0],
                    'bbox': [x - 10, y - 10, 60, 80], 'score': score,
                    'category_id': 1}

        # perfect on easy, perfect on medium, garbage on hard
        m.accumulate([pred(50, 50)], {'image_id': 1})
        m.accumulate([pred(80, 60)], {'image_id': 2})
        m.accumulate([pred(400, 400)], {'image_id': 3})
        stats = m.stats()
        by = dict(zip(stats['text_labels'], stats['stats']))
        assert by['APE'] == pytest.approx(1.0)
        assert by['APM'] == pytest.approx(1.0)
        assert by['APH'] == pytest.approx(0.0)
        assert 0.5 < by['AP'] < 0.75   # 2/3 matched, pooled

    def test_crowd_group_bands(self):
        assert metric.Coco._crowd_group(0.0) == 'E'
        assert metric.Coco._crowd_group(0.09999) == 'E'
        assert metric.Coco._crowd_group(0.1) == 'M'
        assert metric.Coco._crowd_group(0.79999) == 'M'
        assert metric.Coco._crowd_group(0.8) == 'H'
        assert metric.Coco._crowd_group(1.0) == 'H'
