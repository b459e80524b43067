"""Generic COCO-format keypoint datamodule base.

Factors the shared structure of the reference's dataset plugins
(``src/openpifpaf/plugins/{crowdpose,wholebody,animalpose,apollocar3d}/``):
each is a CocoKp-shaped datamodule over COCO-format annotation jsons with
its own keypoint names, sigmas, skeleton, hflip table and data paths.
Subclasses fill the class-level constants; the cli/configure flag group is
generated from the dataset slug.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import encoder, headmeta, metric, transforms
from ..datasets import (DataModule, Loader, collate_images_anns_meta,
                        collate_images_targets_meta)
from .coco.dataset import CocoDataset


class GenericKpDataModule(DataModule):
    """Subclass and set the class constants, then register."""

    # identity
    name: str = None                      # dataset slug, e.g. 'crowdpose'
    keypoints: List[str] = None
    sigmas: List[float] = None
    skeleton: List[Tuple[int, int]] = None
    hflip: Dict[str, str] = None
    upright_pose: np.ndarray = None
    score_weights: Optional[List[float]] = None
    categories: Sequence[int] = (1,)

    # data locations (COCO-format jsons)
    train_annotations: str = None
    val_annotations: str = None
    eval_annotations: str = None
    train_image_dir: str = None
    val_image_dir: str = None
    eval_image_dir: str = None

    # preprocessing
    square_edge = 385
    eval_long_edge = 641
    augmentation = True
    min_kp_anns = 1
    upsample_stride = 1

    def __init__(self):
        cif = headmeta.Cif('cif', self.name,
                           keypoints=self.keypoints,
                           sigmas=self.sigmas,
                           pose=self.upright_pose,
                           draw_skeleton=self.skeleton,
                           score_weights=self.score_weights)
        caf = headmeta.Caf('caf', self.name,
                           keypoints=self.keypoints,
                           sigmas=self.sigmas,
                           pose=self.upright_pose,
                           skeleton=self.skeleton)
        cif.upsample_stride = self.upsample_stride
        caf.upsample_stride = self.upsample_stride
        self.head_metas = [cif, caf]

    # ------------------------------------------------------------------
    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        if cls.name is None:
            return
        group = parser.add_argument_group(f'data module {cls.name}')
        group.add_argument(f'--{cls.name}-train-annotations',
                           dest=f'{cls.name}_train_annotations',
                           default=cls.train_annotations)
        group.add_argument(f'--{cls.name}-val-annotations',
                           dest=f'{cls.name}_val_annotations',
                           default=cls.val_annotations)
        group.add_argument(f'--{cls.name}-train-image-dir',
                           dest=f'{cls.name}_train_image_dir',
                           default=cls.train_image_dir)
        group.add_argument(f'--{cls.name}-val-image-dir',
                           dest=f'{cls.name}_val_image_dir',
                           default=cls.val_image_dir)
        group.add_argument(f'--{cls.name}-square-edge',
                           dest=f'{cls.name}_square_edge',
                           default=cls.square_edge, type=int)
        group.add_argument(f'--{cls.name}-upsample',
                           dest=f'{cls.name}_upsample',
                           default=cls.upsample_stride, type=int)
        group.add_argument(f'--{cls.name}-no-augmentation',
                           dest=f'{cls.name}_augmentation',
                           default=cls.augmentation, action='store_false')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        if cls.name is None:
            return
        cls.train_annotations = getattr(args, f'{cls.name}_train_annotations')
        cls.val_annotations = getattr(args, f'{cls.name}_val_annotations')
        cls.train_image_dir = getattr(args, f'{cls.name}_train_image_dir')
        cls.val_image_dir = getattr(args, f'{cls.name}_val_image_dir')
        cls.square_edge = getattr(args, f'{cls.name}_square_edge')
        cls.upsample_stride = getattr(args, f'{cls.name}_upsample')
        cls.augmentation = getattr(args, f'{cls.name}_augmentation')

    # ------------------------------------------------------------------
    def _normalize(self):
        return transforms.NormalizeAnnotations(
            keypoints=self.keypoints, skeleton=self.skeleton,
            sigmas=self.sigmas, score_weights=self.score_weights)

    def _preprocess(self):
        steps = [self._normalize(), transforms.AnnotationCopy()]
        if self.augmentation:
            if self.hflip:
                steps.append(transforms.RandomApply(
                    transforms.HFlip(self.keypoints, self.hflip), 0.5))
            steps += [
                transforms.RescaleRelative((0.4, 2.0), power_law=True),
                transforms.Crop(self.square_edge, use_area_of_interest=True),
                transforms.CenterPad(self.square_edge),
                transforms.MinSize(min_side=4.0),
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

    def _eval_preprocess(self, long_edge=None, hflip=False):
        long_edge = long_edge or self.eval_long_edge
        steps = [self._normalize()]
        if hflip:
            if not self.hflip:
                raise ValueError(f'{self.name}: no hflip table — '
                                 'use --no-multi-scale-hflip')
            steps.append(transforms.HFlip(self.keypoints, self.hflip))
        steps += [
            transforms.RescaleAbsolute(long_edge),
            transforms.CenterPad(long_edge),
            transforms.EVAL_TRANSFORM,
        ]
        return transforms.Compose(steps)

    def train_loader(self):
        dataset = CocoDataset(
            self.train_image_dir, self.train_annotations,
            preprocess=self._preprocess(), annotation_filter=True,
            min_kp_anns=self.min_kp_anns,
            category_ids=list(self.categories))
        return Loader(dataset, batch_size=self.batch_size, shuffle=True,
                      collate_fn=collate_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def val_loader(self):
        dataset = CocoDataset(
            self.val_image_dir, self.val_annotations,
            preprocess=self._preprocess(), annotation_filter=True,
            min_kp_anns=self.min_kp_anns,
            category_ids=list(self.categories))
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def eval_loader(self, *, long_edge=None, hflip=False):
        dataset = CocoDataset(
            self.eval_image_dir or self.val_image_dir,
            self.eval_annotations or self.val_annotations,
            preprocess=self._eval_preprocess(long_edge, hflip),
            annotation_filter=True,
            min_kp_anns=self.min_kp_anns,
            category_ids=list(self.categories))
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_images_anns_meta,
                      num_workers=self.loader_workers, drop_last=False)

    def metrics(self):
        ann_file = self.eval_annotations or self.val_annotations
        have_file = ann_file and os.path.exists(ann_file)
        return [metric.Coco(
            ann_file=ann_file if have_file else None,
            ground_truth_from_loader=not have_file,
            iou_type='keypoints',
            keypoint_oks_sigmas=self.sigmas)]
