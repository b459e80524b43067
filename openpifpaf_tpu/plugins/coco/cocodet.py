"""CocoDet datamodule: COCO object detection (80 categories).

Reference parity: ``src/openpifpaf/plugins/coco/cocodet.py``.
"""

from __future__ import annotations

import argparse
import os

from . import constants
from .dataset import CocoDataset
from ... import encoder, headmeta, metric, transforms
from ...datasets import (DataModule, Loader, collate_images_anns_meta,
                         collate_images_targets_meta)


class CocoDet(DataModule):
    train_annotations = 'data-mscoco/annotations/instances_train2017.json'
    val_annotations = 'data-mscoco/annotations/instances_val2017.json'
    eval_annotations = val_annotations
    train_image_dir = 'data-mscoco/images/train2017/'
    val_image_dir = 'data-mscoco/images/val2017/'
    eval_image_dir = val_image_dir

    square_edge = 513
    augmentation = True
    eval_long_edge = 641

    def __init__(self):
        cifdet = headmeta.CifDet('cifdet', 'cocodet',
                                 categories=constants.COCO_CATEGORIES)
        self.head_metas = [cifdet]

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('data module CocoDet')
        group.add_argument('--cocodet-train-annotations',
                           default=cls.train_annotations)
        group.add_argument('--cocodet-val-annotations',
                           default=cls.val_annotations)
        group.add_argument('--cocodet-train-image-dir',
                           default=cls.train_image_dir)
        group.add_argument('--cocodet-val-image-dir',
                           default=cls.val_image_dir)
        group.add_argument('--cocodet-square-edge', default=cls.square_edge,
                           type=int)
        group.add_argument('--cocodet-no-augmentation',
                           dest='cocodet_augmentation',
                           default=True, action='store_false')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.train_annotations = args.cocodet_train_annotations
        cls.val_annotations = args.cocodet_val_annotations
        cls.train_image_dir = args.cocodet_train_image_dir
        cls.val_image_dir = args.cocodet_val_image_dir
        cls.square_edge = args.cocodet_square_edge
        cls.augmentation = args.cocodet_augmentation

    def _normalize(self):
        return transforms.NormalizeAnnotations(
            keypoints=[], skeleton=[], categories=constants.COCO_CATEGORIES)

    def _preprocess(self):
        steps = [self._normalize()]
        if self.augmentation:
            steps += [
                transforms.RescaleRelative((0.5, 2.0), power_law=True),
                transforms.Crop(self.square_edge),
                transforms.CenterPad(self.square_edge),
            ]
        else:
            steps += [
                transforms.RescaleAbsolute(self.square_edge),
                transforms.CenterPad(self.square_edge),
            ]
        steps += [
            transforms.TRAIN_TRANSFORM,
            encoder.Encoders(encoder.factory(self.head_metas)),
        ]
        return transforms.Compose(steps)

    def _eval_preprocess(self):
        return transforms.Compose([
            self._normalize(),
            transforms.RescaleAbsolute(self.eval_long_edge),
            transforms.CenterPad(self.eval_long_edge),
            transforms.EVAL_TRANSFORM,
        ])

    def train_loader(self):
        dataset = CocoDataset(self.train_image_dir, self.train_annotations,
                              preprocess=self._preprocess(),
                              annotation_filter=True)
        return Loader(dataset, batch_size=self.batch_size, shuffle=True,
                      collate_fn=collate_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def val_loader(self):
        dataset = CocoDataset(self.val_image_dir, self.val_annotations,
                              preprocess=self._preprocess(),
                              annotation_filter=True)
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def eval_loader(self):
        dataset = CocoDataset(self.eval_image_dir, self.eval_annotations,
                              preprocess=self._eval_preprocess())
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_images_anns_meta,
                      num_workers=self.loader_workers, drop_last=False)

    def metrics(self):
        return [metric.Coco(
            ann_file=self.eval_annotations if os.path.exists(
                self.eval_annotations) else None,
            ground_truth_from_loader=not os.path.exists(self.eval_annotations),
            iou_type='bbox',
            category_ids=list(range(1, len(constants.COCO_CATEGORIES) + 1)))]
