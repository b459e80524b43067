"""Multi-scale prediction merging tests."""

import numpy as np

from openpifpaf_tpu.annotation import Annotation
from openpifpaf_tpu.predictor import Predictor
from openpifpaf_tpu.plugins.coco import constants


def make_ann(offset=0.0, score=0.5):
    ann = Annotation(constants.COCO_KEYPOINTS, constants.COCO_PERSON_SKELETON,
                     sigmas=constants.COCO_PERSON_SIGMAS)
    ann.data[:, 0] = constants.COCO_UPRIGHT_POSE[:, 0] * 20 + 100 + offset
    ann.data[:, 1] = constants.COCO_UPRIGHT_POSE[:, 1] * 20 + 100
    ann.data[:, 2] = score
    ann.fixed_score = score
    return ann


def test_merge_suppresses_duplicates():
    a = make_ann(0.0, score=0.9)
    b = make_ann(0.5, score=0.5)    # same pose, from another scale
    c = make_ann(200.0, score=0.4)  # different person
    merged = Predictor.merge_annotations(
        [[a, c], [b]], sigmas=constants.COCO_PERSON_SIGMAS)
    assert a in merged
    assert b not in merged
    assert c in merged


def test_merge_keeps_highest_score():
    low = make_ann(0.0, score=0.3)
    high = make_ann(0.2, score=0.8)
    merged = Predictor.merge_annotations(
        [[low], [high]], sigmas=constants.COCO_PERSON_SIGMAS)
    assert merged == [high]


def test_images_multiscale(tmp_path):
    import jax
    import PIL.Image

    from openpifpaf_tpu import models
    from test_export_migrate import build_model

    model = build_model()
    predictor = Predictor(model=model)
    img_path = tmp_path / 'img.jpg'
    PIL.Image.fromarray(
        np.zeros((60, 80, 3), np.uint8), 'RGB').save(str(img_path))

    results = list(predictor.images_multiscale([str(img_path)], [33, 49]))
    assert len(results) == 1
    preds, gt, meta = results[0]
    assert isinstance(preds, list)


def test_images_routes_multiscale(tmp_path, monkeypatch):
    import PIL.Image

    from test_export_migrate import build_model

    model = build_model()
    monkeypatch.setattr(Predictor, 'multi_scale', True)
    monkeypatch.setattr(Predictor, 'multi_scale_factors', (0.75, 1.0))
    monkeypatch.setattr(Predictor, 'long_edge', 49)
    predictor = Predictor(model=model)
    img_path = tmp_path / 'img.jpg'
    PIL.Image.fromarray(
        np.zeros((60, 80, 3), np.uint8), 'RGB').save(str(img_path))

    results = list(predictor.images([str(img_path)]))
    assert len(results) == 1
    preds, _, meta = results[0]
    assert isinstance(preds, list)
    # reference variant is the largest non-flipped scale
    assert meta['width_height'][0] == 49


def test_images_multiscale_json_data(tmp_path):
    """json_data=True with multi_scale: per-variant decodes must stay
    Annotation objects through the OKS merge, with json conversion applied
    only after (previously every non-first variant was silently dropped)."""
    import PIL.Image
    import numpy as np

    from test_export_migrate import build_model

    model = build_model()
    predictor = Predictor(model=model, json_data=True)
    img_path = tmp_path / 'img.jpg'
    PIL.Image.fromarray(
        np.zeros((60, 80, 3), np.uint8), 'RGB').save(str(img_path))

    results = list(predictor.images_multiscale([str(img_path)], [33, 49]))
    assert len(results) == 1
    preds, _, _ = results[0]
    assert all(isinstance(p, dict) for p in preds)
    assert predictor.json_data is True  # restored after the generator


def test_merge_passthrough_from_reference_variant():
    """Box-only annotations pass through from the reference variant's list,
    not annotation_lists[0]."""
    from openpifpaf_tpu.annotation import AnnotationDet

    det0 = AnnotationDet(['person'])
    det0.set(1, 0.9, (0.0, 0.0, 10.0, 10.0))
    det_ref = AnnotationDet(['person'])
    det_ref.set(1, 0.8, (5.0, 5.0, 10.0, 10.0))
    merged = Predictor.merge_annotations(
        [[det0], [det_ref]], sigmas=constants.COCO_PERSON_SIGMAS,
        reference_index=1)
    assert merged == [det_ref]


def test_hflip_box_only_annotation():
    """HFlip must not crash on box-only annotations (AnnotationDet /
    AnnotationCrowd GT) and must mirror their bbox."""
    import PIL.Image
    import numpy as np

    from openpifpaf_tpu.annotation import AnnotationDet
    from openpifpaf_tpu.transforms.hflip import (HFlip,
                                                 hflip_map_from_keypoints)

    det = AnnotationDet(['person'])
    det.set(1, 0.9, (10.0, 20.0, 30.0, 40.0))
    image = PIL.Image.fromarray(np.zeros((100, 200, 3), np.uint8), 'RGB')
    hflip = HFlip(constants.COCO_KEYPOINTS,
                  hflip_map_from_keypoints(constants.COCO_KEYPOINTS))
    _, anns, _ = hflip(image, [det], None)
    bb = np.asarray(anns[0].bbox)
    np.testing.assert_allclose(bb, [199.0 - 40.0, 20.0, 30.0, 40.0])


def test_hflip_map_from_keypoints():
    from openpifpaf_tpu.transforms.hflip import hflip_map_from_keypoints

    table = hflip_map_from_keypoints(constants.COCO_KEYPOINTS)
    assert table == {k: v for k, v in constants.HFLIP.items()}
