"""Synthetic tracking datamodule — the fast tracking CI workload.

Plays the role the reference's cifar10 plugin plays for single-frame
training (``src/openpifpaf/plugins/cifar10/datamodule.py:~20``): a
seconds-fast generated workload, here for the *tracking* stack — frame
pairs with simulated motion, CIF+CAF+TCAF heads, trainable end to end.
"""

from __future__ import annotations

import argparse

from .cocokpst import _PairEval, tracking_head_metas
from ..coco import constants
from ..toykp.datamodule import ToyKpDataset
from ... import encoder, metric, transforms
from ...datasets import (DataModule, Loader,
                         collate_tracking_images_anns_meta,
                         collate_tracking_images_targets_meta)


class ToyKpSt(DataModule):
    n_images = 32
    n_val_images = 8
    image_size = 161
    max_shift = 12.0
    augmentation = True   # same spatial augmentation as toykp — without
    # it the 32 fixed renders are memorized (train/val loss diverges)

    def __init__(self):
        self.head_metas = tracking_head_metas(
            'toykpst',
            keypoints=constants.COCO_KEYPOINTS,
            sigmas=constants.COCO_PERSON_SIGMAS,
            pose=constants.COCO_UPRIGHT_POSE,
            skeleton=constants.COCO_PERSON_SKELETON,
            score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('data module ToyKpSt')
        group.add_argument('--toykpst-n-images', default=cls.n_images,
                           type=int)
        group.add_argument('--toykpst-image-size', default=cls.image_size,
                           type=int)
        group.add_argument('--toykpst-max-shift', default=cls.max_shift,
                           type=float)

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.n_images = args.toykpst_n_images
        cls.image_size = args.toykpst_image_size
        cls.max_shift = args.toykpst_max_shift

    def _normalize(self):
        return transforms.NormalizeAnnotations(
            keypoints=constants.COCO_KEYPOINTS,
            skeleton=constants.COCO_PERSON_SKELETON,
            sigmas=constants.COCO_PERSON_SIGMAS,
            score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)

    def _preprocess(self, seed: int = None):
        steps = [self._normalize()]
        if self.augmentation:
            steps += [
                transforms.RandomApply(
                    transforms.HFlip(constants.COCO_KEYPOINTS,
                                     constants.HFLIP), 0.5),
                transforms.RescaleRelative((0.8, 1.25)),
                transforms.Crop(self.image_size),
                transforms.CenterPad(self.image_size),
            ]
        else:
            steps += [
                transforms.RescaleAbsolute(self.image_size),
                transforms.CenterPad(self.image_size),
            ]
        steps += [
            transforms.TRAIN_TRANSFORM,
            transforms.ImageToTracking(max_shift_px=self.max_shift,
                                       seed=seed),
            encoder.TrackingEncoders(encoder.factory(self.head_metas)),
        ]
        return transforms.Compose(steps)

    def _eval_preprocess(self):
        return transforms.Compose([
            self._normalize(),
            transforms.RescaleAbsolute(self.image_size),
            transforms.CenterPad(self.image_size),
            transforms.EVAL_TRANSFORM,
            _PairEval(transforms.ImageToTracking(max_shift_px=self.max_shift,
                                                 seed=123)),
        ])

    def train_loader(self):
        dataset = ToyKpDataset(self.n_images, self.image_size,
                               self._preprocess(seed=7), seed=0)
        return Loader(dataset, batch_size=self.batch_size, shuffle=True,
                      collate_fn=collate_tracking_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def val_loader(self):
        dataset = ToyKpDataset(self.n_val_images, self.image_size,
                               self._preprocess(seed=8), seed=1000)
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_tracking_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def eval_loader(self):
        dataset = ToyKpDataset(self.n_val_images, self.image_size,
                               self._eval_preprocess(), seed=1000)
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_tracking_images_anns_meta,
                      num_workers=self.loader_workers, drop_last=False)

    def metrics(self):
        return [
            metric.Coco(ground_truth_from_loader=True,
                        keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS),
            metric.PoseTrack(keypoint_oks_sigmas=constants.COCO_PERSON_SIGMAS),
        ]
