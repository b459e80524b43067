"""Transform tests: meta inverse round trips, hflip swaps, padding.

Mirrors reference ``tests/test_transforms.py`` semantics.
"""

import numpy as np
import PIL.Image

from openpifpaf_tpu import transforms
from openpifpaf_tpu.annotation import Annotation
from openpifpaf_tpu.plugins.coco import constants


def make_image(w=200, h=120):
    rng = np.random.default_rng(0)
    return PIL.Image.fromarray(
        rng.integers(0, 255, (h, w, 3), np.uint8), 'RGB')


def make_ann():
    ann = Annotation(constants.COCO_KEYPOINTS, constants.COCO_PERSON_SKELETON)
    ann.data[:, 0] = np.linspace(20, 180, 17)
    ann.data[:, 1] = np.linspace(10, 110, 17)
    ann.data[:, 2] = 2.0
    return ann


def test_rescale_absolute_inverse():
    image, anns, meta = transforms.Compose([
        transforms.RescaleAbsolute(321),
        transforms.CenterPad(321),
    ])(make_image(), [make_ann()], None)
    assert image.size == (321, 321)
    # round trip through inverse_transform recovers original coordinates
    orig = make_ann()
    restored = anns[0].inverse_transform(meta)
    np.testing.assert_allclose(restored.data[:, :2], orig.data[:, :2],
                               atol=0.8)


def test_hflip_roundtrip():
    image = make_image()
    ann = make_ann()
    orig = ann.copy()
    t = transforms.HFlip(constants.COCO_KEYPOINTS, constants.HFLIP)
    image2, anns, meta = t(image, [ann], None)
    assert image2.size == image.size
    # left_eye (idx 1) now holds what was right_eye (idx 2), x mirrored
    w = image.size[0]
    assert abs(anns[0].data[1, 0] - (-orig.data[2, 0] + w - 1)) < 1e-5
    restored = anns[0].inverse_transform(meta)
    np.testing.assert_allclose(restored.data[:, :2], orig.data[:, :2],
                               atol=1e-3)


def test_crop_tracks_offset():
    rng = np.random.default_rng(3)
    image, anns, meta = transforms.Crop(64, rng=rng)(
        make_image(), [make_ann()], None)
    assert max(image.size) <= 64
    restored = anns[0].inverse_transform(meta)
    np.testing.assert_allclose(restored.data[:, :2],
                               make_ann().data[:, :2], atol=1e-3)


def test_center_pad_tight():
    image, _, meta = transforms.CenterPadTight(16)(make_image(), [], None)
    w, h = image.size
    assert (w - 1) % 16 == 0
    assert (h - 1) % 16 == 0


def test_image_to_numpy_normalization():
    arr, _, _ = transforms.EVAL_TRANSFORM(make_image(), [], None)
    assert arr.shape == (120, 200, 3)
    assert arr.dtype == np.float32
    assert -3.0 < arr.mean() < 3.0


def test_rotateby90_pixel_consistency():
    """A marked pixel must move to where the transformed annotation says."""
    arr = np.zeros((120, 200, 3), np.uint8)
    arr[30, 50] = (255, 0, 0)
    image = PIL.Image.fromarray(arr, 'RGB')
    ann = Annotation(constants.COCO_KEYPOINTS, constants.COCO_PERSON_SKELETON)
    ann.data[0] = (50.0, 30.0, 2.0)
    image2, anns, _ = transforms.RotateBy90(fixed_angle=90)(image, [ann], None)
    out = np.asarray(image2)
    red = np.argwhere((out[:, :, 0] > 200) & (out[:, :, 1] < 60)
                      & (out[:, :, 2] < 60))
    assert len(red) >= 1
    y_px, x_px = red.mean(axis=0)
    assert abs(anns[0].data[0, 0] - x_px) < 1.5
    assert abs(anns[0].data[0, 1] - y_px) < 1.5


def test_rotateby90_inverse():
    image = make_image()
    ann = make_ann()
    orig = ann.copy()
    t = transforms.RotateBy90(fixed_angle=90)
    _, anns, meta = t(image, [ann], None)
    restored = anns[0].inverse_transform(meta)
    np.testing.assert_allclose(restored.data[:, :2], orig.data[:, :2],
                               atol=0.6)


def test_random_apply_prob_zero_and_one():
    image = make_image()
    t0 = transforms.RandomApply(
        transforms.HFlip(constants.COCO_KEYPOINTS, constants.HFLIP), 0.0)
    _, _, meta0 = t0(image, [make_ann()], None)
    assert not meta0['hflip']
    t1 = transforms.RandomApply(
        transforms.HFlip(constants.COCO_KEYPOINTS, constants.HFLIP), 1.0)
    _, _, meta1 = t1(image, [make_ann()], None)
    assert meta1['hflip']


def test_to_annotations_converters():
    from openpifpaf_tpu.annotation import AnnotationCrowd, AnnotationDet

    raw = [
        {'keypoints': [50.0, 40.0, 2.0] * 17, 'bbox': [40, 30, 20, 20],
         'category_id': 1, 'iscrowd': 0},
        {'bbox': [10, 10, 30, 15], 'category_id': 1, 'iscrowd': 0},
        {'bbox': [0, 0, 100, 50], 'category_id': 1, 'iscrowd': 1},
    ]
    to_anns = transforms.ToAnnotations([
        transforms.ToKpAnnotations(
            ['person'],
            keypoints_by_category={1: constants.COCO_KEYPOINTS},
            skeleton_by_category={1: constants.COCO_PERSON_SKELETON}),
        transforms.ToCrowdAnnotations(['person']),
    ])
    _, anns, _ = to_anns(make_image(), list(raw), None)
    assert len(anns) == 2
    assert isinstance(anns[0], Annotation)
    np.testing.assert_allclose(anns[0].data[0], [50.0, 40.0, 2.0])
    assert isinstance(anns[1], AnnotationCrowd)
    assert anns[1].json_data()['iscrowd'] == 1

    dets = transforms.ToDetAnnotations(['person'])(list(raw))
    assert len(dets) == 2
    assert all(isinstance(d, AnnotationDet) for d in dets)
    np.testing.assert_allclose(dets[1].bbox, [10, 10, 30, 15])

    # crowd + det inverse transforms undo a rescale+pad pipeline
    image, anns, meta = transforms.Compose([
        transforms.RescaleAbsolute(321), transforms.CenterPad(321),
    ])(make_image(), [anns[1]], None)
    restored = anns[0].inverse_transform(meta)
    np.testing.assert_allclose(restored.bbox, [0, 0, 100, 50], atol=0.8)


class TestSyncPair:
    """transforms.SyncPair: both frames of a pair draw identical random
    augmentation parameters (reference transforms/pair.py rng restore)."""

    @staticmethod
    def _pair(seed=0):
        import PIL.Image
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 255, (80, 120, 3), np.uint8)
        image = PIL.Image.fromarray(arr, 'RGB')
        def anns():
            return [{
                'keypoints': np.asarray([[30.0, 40.0, 2.0],
                                         [60.0, 20.0, 2.0],
                                         [90.0, 60.0, 2.0]], np.float32),
                'bbox': [20.0, 10.0, 80.0, 60.0],
                'iscrowd': 0, 'track_id': 0, 'category_id': 1,
            }]
        return [image, image.copy()], [anns(), anns()]

    @staticmethod
    def _frame_transform(seed):
        from openpifpaf_tpu.plugins.coco import constants
        rng = np.random.default_rng(seed)
        return transforms.Compose([
            transforms.NormalizeAnnotations(
                keypoints=constants.COCO_KEYPOINTS[:3],
                skeleton=[(1, 2), (2, 3)]),
            transforms.RandomApply(
                transforms.HFlip(constants.COCO_KEYPOINTS[:3],
                                 {'left_eye': 'right_eye',
                                  'right_eye': 'left_eye'}),
                0.5, rng=np.random.default_rng(seed + 1)),
            transforms.RescaleRelative((0.5, 1.5),
                                       rng=np.random.default_rng(seed + 2)),
            transforms.Crop(49, rng=rng),
            transforms.CenterPad(49),
        ])

    def test_frames_synchronized(self):
        for seed in range(8):
            images, anns_pair = self._pair(seed)
            sync = transforms.SyncPair(self._frame_transform(100 + seed))
            out_images, out_anns, _ = sync(images, anns_pair, {})
            a, b = np.asarray(out_images[0]), np.asarray(out_images[1])
            np.testing.assert_array_equal(a, b)
            np.testing.assert_allclose(out_anns[0][0].data,
                                       out_anns[1][0].data)

    def test_without_sync_frames_diverge(self):
        diverged = 0
        for seed in range(8):
            images, anns_pair = self._pair(seed)
            plain = transforms.SingleImage(self._frame_transform(100 + seed))
            out_images, _, _ = plain(images, anns_pair, {})
            if not np.array_equal(np.asarray(out_images[0]),
                                  np.asarray(out_images[1])):
                diverged += 1
        assert diverged >= 4   # unsynchronized draws must actually differ

    def test_generator_discovery(self):
        sync = transforms.SyncPair(self._frame_transform(0))
        rngs = sync._generators(sync.transform)
        assert len(rngs) == 3  # RandomApply, RescaleRelative, Crop
