"""Brute-force oracle for the numpy COCO evaluator + property tests.

``metric/cocoeval.py`` reimplements pycocotools (unavailable here; the
reference wraps it, ``src/openpifpaf/metric/coco.py:~20``).  This module
contains a SECOND, independent implementation of the protocol — scalar
loops, no vectorization, and interpolated precision computed directly from
its definition (``p_interp(r) = max{p(k) : recall(k) >= r}``, an O(n^2)
scan instead of the monotonic-fix + searchsorted trick) — and compares the
two on hundreds of randomized small scenes plus hand-built edge-case
fixtures (crowd reuse, ties, maxDet truncation, pathological score chains).
"""

import numpy as np
import pytest

from openpifpaf_tpu.metric.cocoeval import (
    AREA_RANGES_BBOX, AREA_RANGES_KP, CocoEval, DtInstance, GtInstance,
    IOU_THRESHOLDS, RECALL_THRESHOLDS, bbox_iou, oks)

SIGMAS = np.array([0.1, 0.08, 0.12])


# ---------------------------------------------------------------------------
# the oracle: direct transliteration of the pycocotools protocol, scalar
# ---------------------------------------------------------------------------

def oracle_match_image(dts, gts, t, sigmas, area_range, max_dets, iou_type):
    """Greedy matching for ONE image at ONE threshold.

    Returns (records, n_gt) where records is a list of
    ``(score, matched, ignored)`` per kept detection and n_gt counts the
    non-ignored ground truths.
    """
    lo, hi = area_range

    def gt_is_ignored(g):
        if g.iscrowd:
            return True
        if not lo <= g.area <= hi:
            return True
        if iou_type == 'keypoints' and g.keypoints is not None \
                and int((g.keypoints[:, 2] > 0).sum()) == 0:
            return True
        return False

    gt_ign = [gt_is_ignored(g) for g in gts]
    # gts sorted: non-ignored first, original order within each group
    gt_idx = sorted(range(len(gts)), key=lambda i: bool(gt_ign[i]))
    # dts sorted by descending score (stable), capped at max_dets
    dt_idx = sorted(range(len(dts)), key=lambda i: -dts[i].score)[:max_dets]

    def iou_of(d, g):
        if iou_type == 'keypoints':
            return oks(d.keypoints, g, sigmas)
        return bbox_iou(d.bbox, g)

    taken = set()
    records = []
    for di in dt_idx:
        d = dts[di]
        best_iou = min(t, 1.0 - 1e-10)
        best = None
        for gi in gt_idx:
            g = gts[gi]
            if gi in taken and not g.iscrowd:
                continue
            # gts are sorted unignored-first: once a non-ignored match
            # exists, ignored gts cannot improve it
            if best is not None and not gt_ign[best] and gt_ign[gi]:
                break
            v = iou_of(d, g)
            if v < best_iou:
                continue
            best_iou = v
            best = gi
        if best is None:
            if iou_type == 'keypoints' and d.keypoints is not None:
                x, y = d.keypoints[:, 0], d.keypoints[:, 1]
                d_area = float((x.max() - x.min()) * (y.max() - y.min()))
            else:
                d_area = float(d.bbox[2] * d.bbox[3])
            records.append((d.score, False, not lo <= d_area <= hi))
        else:
            taken.add(best)
            records.append((d.score, True, bool(gt_ign[best])))
    n_gt = sum(1 for ig in gt_ign if not ig)
    return records, n_gt


def oracle_pr(records, n_gt):
    """AP/AR from pooled records at one threshold, by direct definition."""
    if n_gt == 0:
        return -1.0, -1.0
    # global stable sort by descending score (pycocotools mergesort)
    order = sorted(range(len(records)), key=lambda i: -records[i][0])
    kept = [records[i] for i in order if not records[i][2]]
    precisions, recalls = [], []
    tp = fp = 0
    for _, matched, _ in kept:
        if matched:
            tp += 1
        else:
            fp += 1
        precisions.append(tp / (tp + fp))
        recalls.append(tp / n_gt)
    ap = 0.0
    for r in RECALL_THRESHOLDS:
        best = 0.0
        for p, rec in zip(precisions, recalls):
            if rec >= r and p > best:
                best = p
        ap += best
    ap /= len(RECALL_THRESHOLDS)
    ar = recalls[-1] if recalls else 0.0
    return ap, ar


def oracle_summarize(images, *, sigmas, iou_type, max_dets):
    area_ranges = (AREA_RANGES_KP if iou_type == 'keypoints'
                   else AREA_RANGES_BBOX)
    results = {}
    for range_name, area_range in area_ranges.items():
        aps, ars = [], []
        for t in IOU_THRESHOLDS:
            records, n_gt = [], 0
            any_content = False
            for dts, gts in images:
                if not dts and not gts:
                    continue
                any_content = True
                rec, n = oracle_match_image(dts, gts, t, sigmas, area_range,
                                            max_dets, iou_type)
                records.extend(rec)
                n_gt += n
            if not any_content or n_gt == 0:
                aps.append(-1.0)
                ars.append(-1.0)
                continue
            ap, ar = oracle_pr(records, n_gt)
            aps.append(ap)
            ars.append(ar)
        suffix = '' if range_name == 'all' else range_name[0].upper()
        valid_ap = [a for a in aps if a > -1]
        valid_ar = [a for a in ars if a > -1]
        results[f'AP{suffix}'] = float(np.mean(valid_ap)) if valid_ap else -1.0
        results[f'AR{suffix}'] = float(np.mean(valid_ar)) if valid_ar else -1.0
        if range_name == 'all':
            results['AP0.5'] = aps[0] if aps[0] > -1 else -1.0
            results['AP0.75'] = aps[5] if aps[5] > -1 else -1.0
            results['AR0.5'] = ars[0] if ars[0] > -1 else -1.0
            results['AR0.75'] = ars[5] if ars[5] > -1 else -1.0
    return results


# ---------------------------------------------------------------------------
# randomized scenes
# ---------------------------------------------------------------------------

def random_kp_scene(rng):
    """1-4 images of random gts (crowd/unlabeled mixed) and dts (some near
    gts, some spurious, tied scores common by 1-decimal rounding)."""
    images = []
    for _ in range(int(rng.integers(1, 5))):
        gts, dts = [], []
        positions = []
        for _ in range(int(rng.integers(0, 6))):
            x, y = rng.uniform(0, 400, 2)
            spread = float(rng.uniform(5, 60))
            area = float(rng.uniform(500, 15000))
            kps = np.array([[x, y, 2], [x, y + spread, 2],
                            [x, y + 2 * spread, 2]], np.float32)
            iscrowd = bool(rng.uniform() < 0.25)
            if rng.uniform() < 0.15:
                kps[:, 2] = 0  # unlabeled
            gts.append(GtInstance(
                keypoints=kps,
                bbox=np.array([x, y, np.sqrt(area), np.sqrt(area)],
                              np.float32),
                area=area, iscrowd=iscrowd))
            positions.append((x, y, spread))
        for _ in range(int(rng.integers(0, 8))):
            if positions and rng.uniform() < 0.7:
                x, y, spread = positions[int(rng.integers(len(positions)))]
                x += float(rng.normal(0, 10))
                y += float(rng.normal(0, 10))
            else:
                x, y = rng.uniform(0, 400, 2)
                spread = float(rng.uniform(5, 60))
            kps = np.array([[x, y, 2], [x, y + spread, 2],
                            [x, y + 2 * spread, 2]], np.float32)
            score = float(np.round(rng.uniform(0.05, 1.0), 1))  # forces ties
            dts.append(DtInstance(keypoints=kps,
                                  bbox=np.zeros(4, np.float32), score=score))
        images.append((dts, gts))
    return images


def random_bbox_scene(rng):
    images = []
    for _ in range(int(rng.integers(1, 4))):
        gts, dts = [], []
        boxes = []
        for _ in range(int(rng.integers(0, 5))):
            x, y = rng.uniform(0, 300, 2)
            w, h = rng.uniform(10, 150, 2)
            gts.append(GtInstance(
                keypoints=None, bbox=np.array([x, y, w, h], np.float32),
                area=float(w * h), iscrowd=bool(rng.uniform() < 0.2)))
            boxes.append((x, y, w, h))
        for _ in range(int(rng.integers(0, 7))):
            if boxes and rng.uniform() < 0.7:
                x, y, w, h = boxes[int(rng.integers(len(boxes)))]
                x += float(rng.normal(0, 8))
                y += float(rng.normal(0, 8))
                w *= float(rng.uniform(0.7, 1.3))
                h *= float(rng.uniform(0.7, 1.3))
            else:
                x, y = rng.uniform(0, 300, 2)
                w, h = rng.uniform(10, 150, 2)
            score = float(np.round(rng.uniform(0.05, 1.0), 1))
            dts.append(DtInstance(keypoints=None,
                                  bbox=np.array([x, y, w, h], np.float32),
                                  score=score))
        images.append((dts, gts))
    return images


def production_summary(images, *, sigmas, iou_type, max_dets):
    ev = CocoEval(iou_type=iou_type, sigmas=sigmas, max_dets=max_dets)
    for image_id, (dts, gts) in enumerate(images):
        ev.add_image(image_id, dts, gts)
    return ev.summarize()


def assert_summaries_equal(images, *, sigmas, iou_type, max_dets=20):
    got = production_summary(images, sigmas=sigmas, iou_type=iou_type,
                             max_dets=max_dets)
    want = oracle_summarize(images, sigmas=sigmas, iou_type=iou_type,
                            max_dets=max_dets)
    for key, w in want.items():
        assert got[key] == pytest.approx(w, abs=1e-9), \
            f'{key}: production {got[key]} != oracle {w}'


@pytest.mark.parametrize('seed', range(40))
def test_random_keypoint_scenes_match_oracle(seed):
    rng = np.random.default_rng(seed)
    assert_summaries_equal(random_kp_scene(rng), sigmas=SIGMAS,
                           iou_type='keypoints')


@pytest.mark.parametrize('seed', range(40, 70))
def test_random_bbox_scenes_match_oracle(seed):
    rng = np.random.default_rng(seed)
    assert_summaries_equal(random_bbox_scene(rng), sigmas=None,
                           iou_type='bbox')


# ---------------------------------------------------------------------------
# edge-case fixtures
# ---------------------------------------------------------------------------

def kp(x, y, spread=20.0):
    return np.array([[x, y, 2], [x, y + spread, 2], [x, y + 2 * spread, 2]],
                    np.float32)


def gt_at(x, y, *, spread=20.0, area=5000.0, iscrowd=False, unlabeled=False):
    kps = kp(x, y, spread)
    if unlabeled:
        kps[:, 2] = 0
    return GtInstance(keypoints=kps,
                      bbox=np.array([x, y, np.sqrt(area), np.sqrt(area)],
                                    np.float32),
                      area=area, iscrowd=iscrowd)


def dt_at(x, y, *, spread=20.0, score=0.9):
    return DtInstance(keypoints=kp(x, y, spread),
                      bbox=np.zeros(4, np.float32), score=score)


class TestEdgeFixtures:
    def test_crowd_reused_by_multiple_dts(self):
        """Two detections on one crowd gt: both absorbed (ignored), no FPs,
        and the remaining real gt still scores AP 1.0."""
        images = [([dt_at(300, 50, score=0.95), dt_at(302, 50, score=0.9),
                    dt_at(50, 50, score=0.5)],
                   [gt_at(50, 50), gt_at(300, 50, iscrowd=True)])]
        res = production_summary(images, sigmas=SIGMAS,
                                 iou_type='keypoints', max_dets=20)
        assert res['AP'] == pytest.approx(1.0)
        assert_summaries_equal(images, sigmas=SIGMAS, iou_type='keypoints')

    def test_non_crowd_gt_not_reused(self):
        """Second detection on an already-matched NON-crowd gt is a FP."""
        images = [([dt_at(50, 50, score=0.9), dt_at(51, 50, score=0.8)],
                   [gt_at(50, 50)])]
        res = production_summary(images, sigmas=SIGMAS,
                                 iou_type='keypoints', max_dets=20)
        assert res['AP'] == pytest.approx(1.0)   # TP first, trailing FP
        assert res['AR'] == pytest.approx(1.0)
        assert_summaries_equal(images, sigmas=SIGMAS, iou_type='keypoints')

    def test_all_scores_tied(self):
        """Pathological ties: insertion order (stable mergesort) decides."""
        images = [([dt_at(400, 400, score=0.5), dt_at(50, 50, score=0.5),
                    dt_at(401, 401, score=0.5)],
                   [gt_at(50, 50)])]
        # kept order: FP, TP, FP -> precision at recall 1 is 1/2
        res = production_summary(images, sigmas=SIGMAS,
                                 iou_type='keypoints', max_dets=20)
        assert res['AP'] == pytest.approx(0.5)
        assert_summaries_equal(images, sigmas=SIGMAS, iou_type='keypoints')

    def test_tied_scores_across_images(self):
        images = [
            ([dt_at(50, 50, score=0.5)], [gt_at(50, 50)]),
            ([dt_at(400, 400, score=0.5)], [gt_at(50, 50)]),
        ]
        assert_summaries_equal(images, sigmas=SIGMAS, iou_type='keypoints')

    def test_max_dets_boundary(self):
        """Exactly max_dets strong FPs push the single TP off the list."""
        for n_fps, expect_tp in ((19, True), (20, False)):
            dts = [dt_at(400 + 7 * i, 400, score=0.9) for i in range(n_fps)]
            dts.append(dt_at(50, 50, score=0.1))
            images = [(dts, [gt_at(50, 50)])]
            res = production_summary(images, sigmas=SIGMAS,
                                     iou_type='keypoints', max_dets=20)
            assert (res['AR'] > 0) == expect_tp
            assert_summaries_equal(images, sigmas=SIGMAS,
                                   iou_type='keypoints')

    def test_suppression_chain(self):
        """A(0.9) and B(0.8) both overlap gt; A matches, B must fall through
        to a second gt it overlaps less — not be dropped (greedy chain)."""
        images = [([dt_at(50, 50, score=0.9), dt_at(53, 50, score=0.8)],
                   [gt_at(50, 50), gt_at(56, 50)])]
        res = production_summary(images, sigmas=SIGMAS,
                                 iou_type='keypoints', max_dets=20)
        assert res['AR0.5'] == pytest.approx(1.0)
        assert_summaries_equal(images, sigmas=SIGMAS, iou_type='keypoints')

    def test_prefers_unmatched_real_gt_over_crowd(self):
        """A dt overlapping both a crowd (higher OKS) and a real gt must
        match the real gt (unignored-first ordering + break rule)."""
        crowd = gt_at(50, 50, iscrowd=True)
        real = gt_at(58, 50)
        images = [([dt_at(52, 50, score=0.9)], [real, crowd])]
        res = production_summary(images, sigmas=SIGMAS,
                                 iou_type='keypoints', max_dets=20)
        assert res['AR0.5'] == pytest.approx(1.0)
        assert_summaries_equal(images, sigmas=SIGMAS, iou_type='keypoints')

    def test_empty_images_mixed_in(self):
        images = [
            ([], []),
            ([dt_at(50, 50, score=0.9)], [gt_at(50, 50)]),
            ([], [gt_at(50, 50)]),
            ([dt_at(400, 400, score=0.8)], []),
        ]
        assert_summaries_equal(images, sigmas=SIGMAS, iou_type='keypoints')


def test_json_data_rounding_contract():
    """reference annotation.py:~130: keypoint coords rounded to 2 decimals,
    score to 3 with a 0.001 floor; zero-confidence joints zeroed."""
    from openpifpaf_tpu.annotation import Annotation

    ann = Annotation(['a', 'b', 'c'], [(1, 2), (2, 3)], sigmas=SIGMAS)
    ann.data[:] = [[1.23456, 2.34567, 0.87654],
                   [3.45678, 4.56789, 0.0],
                   [5.67891, 6.78912, 0.4]]
    data = ann.json_data()
    assert data['keypoints'][0] == pytest.approx(1.23)
    assert data['keypoints'][1] == pytest.approx(2.35)
    assert data['keypoints'][3] == 0.0  # v == 0 zeroes the coords
    assert data['keypoints'][4] == 0.0
    assert data['keypoints'][6] == pytest.approx(5.68)
    score = data['score']
    assert score == round(score, 3)
    assert score >= 0.001


def test_json_data_score_floor():
    from openpifpaf_tpu.annotation import Annotation

    ann = Annotation(['a', 'b', 'c'], [(1, 2)], sigmas=SIGMAS)
    ann.data[:, 2] = 0.0
    assert ann.json_data()['score'] == 0.001
