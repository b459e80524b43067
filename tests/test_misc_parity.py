"""Tests for the smaller parity modules: multi-scale eval, unclipped
filters, CrossTalk, LoaderWithReset, show CLI flags."""

import argparse

import numpy as np
import PIL.Image
import pytest

from openpifpaf_tpu import transforms
from openpifpaf_tpu.annotation import Annotation
from openpifpaf_tpu.plugins.coco import constants


def make_ann(offset=(0.0, 0.0)):
    ann = Annotation(constants.COCO_KEYPOINTS, constants.COCO_PERSON_SKELETON)
    ann.data[:, 0] = constants.COCO_UPRIGHT_POSE[:, 0] * 10 + 50 + offset[0]
    ann.data[:, 1] = constants.COCO_UPRIGHT_POSE[:, 1] * 5 + 25 + offset[1]
    ann.data[:, 2] = 2.0
    return ann


def test_multi_scale_expansion():
    image = PIL.Image.fromarray(
        np.zeros((100, 150, 3), np.uint8), 'RGB')
    ms = transforms.MultiScale([81, 161])
    images, anns_list, metas = ms(image, [make_ann()], {})
    assert len(images) == 2
    assert max(images[0].size) == 81
    assert max(images[1].size) == 161
    # metas invert predictions back to the same original coordinates
    a0 = anns_list[0][0].inverse_transform(metas[0])
    a1 = anns_list[1][0].inverse_transform(metas[1])
    np.testing.assert_allclose(a0.data[:, :2], a1.data[:, :2], atol=1.0)


def test_multi_scale_hflip():
    image = PIL.Image.fromarray(np.zeros((100, 150, 3), np.uint8), 'RGB')
    ms = transforms.MultiScale(
        [81], hflip_keypoints=constants.COCO_KEYPOINTS,
        hflip_table=constants.HFLIP)
    images, anns_list, metas = ms(image, [make_ann()], {})
    assert len(images) == 2  # scale + flipped scale
    a0 = anns_list[0][0].inverse_transform(metas[0])
    a1 = anns_list[1][0].inverse_transform(metas[1])
    np.testing.assert_allclose(a0.data[:, :2], a1.data[:, :2], atol=1.5)


def test_unclipped_area():
    image = PIL.Image.fromarray(np.zeros((100, 150, 3), np.uint8), 'RGB')
    inside = make_ann()
    outside = make_ann(offset=(130.0, 0.0))  # mostly right of the frame
    t = transforms.UnclippedArea(threshold=0.8)
    _, kept, _ = t(image, [inside, outside], {})
    assert inside in kept
    assert outside not in kept


def test_unclipped_sides():
    image = PIL.Image.fromarray(np.zeros((100, 150, 3), np.uint8), 'RGB')
    t = transforms.UnclippedSides(margin=10.0, max_clipped_sides=1)
    corner = make_ann(offset=(-45.0, -25.0))
    _, kept, _ = t(image, [make_ann(), corner], {})
    assert len(kept) == 1


def test_cross_talk_changes_train_only():
    import jax

    from openpifpaf_tpu import headmeta, models

    cif = headmeta.Cif('cif', 'ct', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS)
    caf = headmeta.Caf('caf', 'ct', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    plain = models.Factory(base_name='shufflenetv2k16', bf16=False,
                           cross_talk=0.0)
    talk = models.Factory(base_name='shufflenetv2k16', bf16=False,
                          cross_talk=0.1)
    m0 = plain.from_scratch('shufflenetv2k16', [cif, caf])
    m0.init(jax.random.key(0), input_hw=(33, 33))
    m1 = talk.from_scratch('shufflenetv2k16', [cif, caf])
    m1.variables = m0.variables

    x = np.random.default_rng(0).normal(size=(2, 33, 33, 3)).astype(
        np.float32)
    # eval: identical
    np.testing.assert_allclose(np.asarray(m0(x)[0]), np.asarray(m1(x)[0]),
                               atol=1e-6)
    # train: cross talk changes the output
    y0 = m0.apply(m0.variables, x, train=True, mutable=['batch_stats'])[0]
    y1 = m1.apply(m1.variables, x, train=True, mutable=['batch_stats'])[0]
    assert np.abs(np.asarray(y0[0]) - np.asarray(y1[0])).max() > 1e-6


def test_loader_with_reset_signal():
    from openpifpaf_tpu.datasets import LoaderWithReset
    from openpifpaf_tpu.signal_ import Signal

    events = []
    Signal.subscribe('eval_reset', lambda: events.append('reset'))
    loader = LoaderWithReset([1, 2, 3])
    assert list(loader) == [1, 2, 3]
    assert list(loader) == [1, 2, 3]
    assert events.count('reset') >= 2
    Signal.subscribers['eval_reset'].pop()


def test_video_transforms():
    img = np.zeros((10, 8, 3), np.float32)
    img[1::2] = 1.0  # comb pattern
    out, _, _ = transforms.Deinterlace()(img, [], {})
    assert out.shape == img.shape
    assert float(np.abs(np.diff(out[:, 0, 0])).max()) <= 1.0
    # even lines propagate down
    np.testing.assert_array_equal(out[0], out[1])

    img2 = np.ones((4, 4, 3), np.float32)
    img2[0, 0, 0] = np.nan
    out2, _, _ = transforms.ImputeNaN()(img2, [], {})
    assert np.isfinite(out2).all()
    assert out2[0, 0, 0] == 1.0


def test_loader_workers():
    from openpifpaf_tpu import datasets

    dm = datasets.factory('toykp')
    type(dm).n_images = 8
    type(dm).image_size = 81
    type(dm).batch_size = 2
    type(dm).loader_workers = 2
    try:
        # model factory attaches strides before loaders exist
        import jax
        from openpifpaf_tpu import models

        models.Factory(base_name='shufflenetv2k16', bf16=False).factory(
            head_metas=dm.head_metas, rng=jax.random.key(0))
        batches = list(dm.train_loader())
        assert len(batches) == 4
        assert batches[0][0].shape == (2, 81, 81, 3)
    finally:
        type(dm).loader_workers = 0


def test_trainer_preemption_flag():
    from openpifpaf_tpu.training.trainer import Trainer

    t = Trainer.__new__(Trainer)
    t._preempted = False
    t._install_preemption_handler()
    import os
    import signal

    os.kill(os.getpid(), signal.SIGTERM)
    assert t._preempted


def test_show_cli_flags():
    from openpifpaf_tpu import show
    from openpifpaf_tpu.show.painters import KeypointPainter

    parser = argparse.ArgumentParser()
    show.cli(parser)
    args = parser.parse_args(['--line-width', '7', '--show-box'])
    old = (KeypointPainter.line_width, KeypointPainter.show_box)
    try:
        show.configure(args)
        assert KeypointPainter.line_width == 7
        assert KeypointPainter.show_box is True
    finally:
        KeypointPainter.line_width, KeypointPainter.show_box = old


def test_torch_dataset_adapter():
    """Any __len__/__getitem__ dataset flows through preprocess
    (reference datasets/torch_dataset.py)."""
    from openpifpaf_tpu.datasets import TorchDatasetAdapter

    class FakeTorchDataset:
        def __len__(self):
            return 3

        def __getitem__(self, index):
            img = np.full((32, 48, 3), index * 10, np.uint8)
            return img, [{'keypoints': [], 'bbox': [0, 0, 5, 5],
                          'iscrowd': 0, 'category_id': 1}]

    calls = []

    def preprocess(image, anns, meta):
        calls.append(meta['dataset_index'])
        return np.asarray(image, np.float32), anns, meta

    adapter = TorchDatasetAdapter(FakeTorchDataset(), preprocess)
    assert len(adapter) == 3
    image, anns, meta = adapter[1]
    assert image.shape == (32, 48, 3)
    assert anns and meta['dataset_index'] == 1 and calls == [1]

    # PIL passthrough without preprocess
    class PilDataset:
        def __len__(self):
            return 1

        def __getitem__(self, index):
            return PIL.Image.new('RGB', (8, 8))

    image, anns, meta = TorchDatasetAdapter(PilDataset())[0]
    assert isinstance(image, PIL.Image.Image) and anns == []


def test_export_coreml_gated():
    """CoreML export fails cleanly without coremltools, pointing at the
    portable StableHLO artifact."""
    from openpifpaf_tpu import export_coreml

    with pytest.raises((RuntimeError, NotImplementedError),
                       match='stablehlo|onnx'):
        export_coreml.apply(None, '/tmp/never-written.mlmodel')


def test_top_level_lazy_exports():
    """Reference API parity: openpifpaf.Predictor etc. at the package root
    (src/openpifpaf/__init__.py), resolved lazily."""
    import openpifpaf_tpu as pkg
    from openpifpaf_tpu.predictor import Predictor

    assert pkg.Predictor is Predictor
    assert pkg.network is pkg.models  # reference subpackage name
    assert hasattr(pkg.show, 'AnnotationPainter')
    with pytest.raises(AttributeError):
        pkg.does_not_exist  # pylint: disable=pointless-statement
