"""PoseTrack (CLEAR-MOT) metric tests with synthetic tracked poses."""

import numpy as np

from openpifpaf_tpu.annotation import Annotation
from openpifpaf_tpu.metric import PoseTrack
from openpifpaf_tpu.plugins.coco import constants


def make_ann(x_offset=0.0, track_id=1):
    ann = Annotation(constants.COCO_KEYPOINTS, constants.COCO_PERSON_SKELETON)
    ann.data[:, 0] = constants.COCO_UPRIGHT_POSE[:, 0] * 20 + 100 + x_offset
    ann.data[:, 1] = constants.COCO_UPRIGHT_POSE[:, 1] * 20 + 100
    ann.data[:, 2] = 2.0
    ann.id_ = track_id
    ann.fixed_score = 0.9
    return ann


def test_perfect_tracking():
    m = PoseTrack(keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS)
    for frame in range(5):
        gt = [make_ann(frame * 5.0, track_id=7)]
        pred = [make_ann(frame * 5.0, track_id=42)]  # stable pred id
        m.accumulate(pred, {'file_name': f'{frame}.jpg'}, ground_truth=gt)
    stats = dict(zip(m.text_labels, m.stats()['stats']))
    assert stats['MOTA'] == 1.0
    assert stats['misses'] == 0
    assert stats['id_switches'] == 0
    assert stats['MOTP'] > 0.9


def test_id_switch_counted():
    m = PoseTrack(keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS)
    for frame in range(4):
        gt = [make_ann(frame * 5.0, track_id=7)]
        # predicted identity changes mid-sequence
        pred = [make_ann(frame * 5.0, track_id=1 if frame < 2 else 2)]
        m.accumulate(pred, {}, ground_truth=gt)
    stats = dict(zip(m.text_labels, m.stats()['stats']))
    assert stats['id_switches'] == 1
    assert stats['MOTA'] == 1.0 - 1.0 / 4.0


def test_misses_and_false_positives():
    m = PoseTrack(keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS)
    # frame 1: gt present, no prediction -> miss
    m.accumulate([], {}, ground_truth=[make_ann()])
    # frame 2: no gt, spurious prediction -> false positive
    m.accumulate([make_ann(track_id=5)], {}, ground_truth=[])
    stats = dict(zip(m.text_labels, m.stats()['stats']))
    assert stats['misses'] == 1
    assert stats['false_positives'] == 1
    assert stats['n_gt'] == 1


def test_write_predictions(tmp_path):
    m = PoseTrack(keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS)
    m.accumulate([make_ann(track_id=3)],
                 {'sequence_id': 'seqA', 'file_name': 'f0.jpg'})
    m.write_predictions(str(tmp_path / 'out'))
    import json

    data = json.loads((tmp_path / 'out.seqA.predictions.json').read_text())
    assert data['sequence'] == 'seqA'
    assert data['frames'][0]['predictions'][0]['track_id'] == 3


def test_no_cross_sequence_id_switches():
    """Independent sequences reuse gt track ids (pseudo-pairs number them
    0, 1, ...); fresh predicted ids in a NEW sequence are not switches."""
    m = PoseTrack(keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS)
    for item in range(5):
        gt = [make_ann(track_id=0)]
        pred = [make_ann(track_id=100 + item)]   # new pred id per item
        m.accumulate(pred, {'sequence_id': f'img{item}'}, ground_truth=gt)
    stats = dict(zip(m.text_labels, m.stats()['stats']))
    assert stats['id_switches'] == 0
    assert stats['MOTA'] == 1.0


def test_within_sequence_switch_still_counts():
    m = PoseTrack(keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS)
    for frame in range(3):
        gt = [make_ann(track_id=0)]
        pred = [make_ann(track_id=frame)]        # changes every frame
        m.accumulate(pred, {'sequence_id': 'seqA'}, ground_truth=gt)
    stats = dict(zip(m.text_labels, m.stats()['stats']))
    assert stats['id_switches'] == 2
