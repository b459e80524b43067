"""PoseTrack2018 datamodule: real video tracking data.

Reference parity: ``src/openpifpaf/plugins/posetrack/posetrack2018.py`` —
consecutive-frame pairs from PoseTrack2018-format sequences (one json per
sequence with ``images`` carrying ``frame_id`` and ``annotations`` carrying
``track_id``).  Requires the PoseTrack download; loader construction fails
cleanly when the data directory is absent (registration is always safe).
Exercised end to end against a synthesized fixture tree in
``tests/test_posetrack2018.py`` (pairs -> encoders -> decode -> metrics).
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os

import numpy as np
import PIL.Image

from . import constants
from .cocokpst import _PairEval, tracking_head_metas
from ... import encoder, metric, transforms
from ...datasets import (DataModule, Loader,
                         collate_tracking_images_anns_meta,
                         collate_tracking_images_targets_meta)
from ...datasets.loader import Dataset

LOG = logging.getLogger(__name__)


class PoseTrack2018Dataset(Dataset):
    """Consecutive-frame pairs from PoseTrack2018 sequence jsons."""

    def __init__(self, annotation_files, data_root: str, preprocess,
                 only_annotated: bool = True):
        self.preprocess = preprocess
        self.data_root = data_root
        self.pairs = []  # (seq_id, fn_prev, fn_curr, anns_prev, anns_curr)
        for path in annotation_files:
            with open(path) as f:
                seq = json.load(f)
            seq_id = os.path.splitext(os.path.basename(path))[0]
            by_image = {}
            for ann in seq.get('annotations', []):
                by_image.setdefault(ann['image_id'], []).append(ann)
            images = sorted(seq.get('images', []),
                            key=lambda im: im.get('frame_id', im['id']))
            for prev, curr in zip(images, images[1:]):
                if only_annotated and curr['id'] not in by_image:
                    continue
                self.pairs.append((
                    seq_id, prev['file_name'], curr['file_name'],
                    by_image.get(prev['id'], []),
                    by_image.get(curr['id'], []),
                ))

    def __len__(self):
        return len(self.pairs)

    @staticmethod
    def _to_dicts(raw_anns):
        out = []
        for raw in raw_anns:
            out.append({
                'keypoints': np.asarray(raw['keypoints'],
                                        np.float32).reshape(-1, 3),
                'bbox': raw.get('bbox', [0.0, 0.0, 1.0, 1.0]),
                'iscrowd': raw.get('iscrowd', 0),
                'track_id': raw.get('track_id', -1),
                'category_id': raw.get('category_id', 1),
            })
        return out

    def __getitem__(self, index):
        seq_id, fn_prev, fn_curr, anns_prev, anns_curr = self.pairs[index]
        image_prev = PIL.Image.open(
            os.path.join(self.data_root, fn_prev)).convert('RGB')
        image_curr = PIL.Image.open(
            os.path.join(self.data_root, fn_curr)).convert('RGB')
        # consecutive pairs of one sequence share sequence_id, so
        # TrackingPose keeps id continuity within the sequence and the
        # CLEAR-MOT metric segments at real sequence boundaries
        meta = {'dataset_index': index, 'file_name': fn_curr,
                'image_id': index, 'sequence_id': seq_id}
        return self.preprocess(
            [image_prev, image_curr],
            [self._to_dicts(anns_prev), self._to_dicts(anns_curr)], meta)


class _PairCompose:
    """Apply per-frame transforms to both frames, then pair-level steps.

    Per-frame steps here must be deterministic (rescale/pad/tensor);
    random augmentation over real pairs goes through
    ``transforms.SyncPair`` as a pair-level step, which snapshots and
    restores rng state so both frames draw identical parameters
    (reference: ``transforms/pair.py``).
    """

    def __init__(self, frame_steps, pair_steps):
        self.frame_steps = frame_steps
        self.pair_steps = pair_steps

    def __call__(self, images, anns_pair, meta):
        out_images, out_anns = [], []
        out_meta = dict(meta)
        for image, anns in zip(images, anns_pair):
            m = dict(meta)
            for step in self.frame_steps:
                image, anns, m = step(image, anns, m)
            out_images.append(image)
            out_anns.append(anns)
            out_meta = m
        result = (out_images, out_anns, out_meta)
        for step in self.pair_steps:
            result = step(*result)
        return result


class PoseTrack2018(DataModule):
    data_root = 'data-posetrack2018'
    train_annotations = 'data-posetrack2018/annotations/train/*.json'
    val_annotations = 'data-posetrack2018/annotations/val/*.json'
    square_edge = 385
    augmentation = True

    def __init__(self):
        self.head_metas = tracking_head_metas(
            'posetrack2018',
            keypoints=constants.KEYPOINTS,
            sigmas=constants.SIGMAS,
            pose=constants.UPRIGHT_POSE,
            skeleton=constants.SKELETON)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('data module PoseTrack2018')
        group.add_argument('--posetrack2018-data-root', default=cls.data_root)
        group.add_argument('--posetrack2018-train-annotations',
                           default=cls.train_annotations)
        group.add_argument('--posetrack2018-val-annotations',
                           default=cls.val_annotations)
        group.add_argument('--posetrack2018-square-edge',
                           default=cls.square_edge, type=int)
        group.add_argument('--posetrack2018-no-augmentation',
                           dest='posetrack2018_augmentation',
                           default=cls.augmentation, action='store_false')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.data_root = args.posetrack2018_data_root
        cls.train_annotations = args.posetrack2018_train_annotations
        cls.val_annotations = args.posetrack2018_val_annotations
        cls.square_edge = args.posetrack2018_square_edge
        cls.augmentation = args.posetrack2018_augmentation

    def _annotation_files(self, pattern: str):
        files = sorted(glob.glob(pattern))
        if not files:
            raise FileNotFoundError(
                f'no PoseTrack annotation files match {pattern!r}')
        return files

    def _normalize(self):
        return transforms.NormalizeAnnotations(
            keypoints=constants.KEYPOINTS,
            skeleton=constants.SKELETON,
            sigmas=constants.SIGMAS)

    def _preprocess(self):
        if self.augmentation:
            frame = transforms.Compose([
                self._normalize(),
                transforms.RandomApply(
                    transforms.HFlip(constants.KEYPOINTS, constants.HFLIP),
                    0.5),
                transforms.RescaleRelative((0.5, 1.5), power_law=True),
                transforms.Crop(self.square_edge, use_area_of_interest=True),
                transforms.CenterPad(self.square_edge),
                transforms.TRAIN_TRANSFORM,
            ])
        else:
            frame = transforms.Compose([
                self._normalize(),
                transforms.RescaleAbsolute(self.square_edge),
                transforms.CenterPad(self.square_edge),
                transforms.TRAIN_TRANSFORM,
            ])
        pair_steps = [
            # synchronized randomness across the two frames
            transforms.SyncPair(frame),
            encoder.TrackingEncoders(encoder.factory(self.head_metas)),
        ]
        return _PairCompose([], pair_steps)

    def _eval_preprocess(self):
        frame_steps = [
            self._normalize(),
            transforms.RescaleAbsolute(self.square_edge),
            transforms.CenterPad(self.square_edge),
            transforms.EVAL_TRANSFORM,
        ]

        def keep_current(images, anns_pair, meta):
            return images, anns_pair[1], meta

        return _PairCompose(frame_steps, [keep_current])

    def train_loader(self):
        dataset = PoseTrack2018Dataset(
            self._annotation_files(self.train_annotations),
            self.data_root, self._preprocess())
        return Loader(dataset, batch_size=self.batch_size, shuffle=True,
                      collate_fn=collate_tracking_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def val_loader(self):
        dataset = PoseTrack2018Dataset(
            self._annotation_files(self.val_annotations),
            self.data_root, self._preprocess())
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_tracking_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def eval_loader(self):
        dataset = PoseTrack2018Dataset(
            self._annotation_files(self.val_annotations),
            self.data_root, self._eval_preprocess())
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_tracking_images_anns_meta,
                      num_workers=self.loader_workers, drop_last=False)

    def metrics(self):
        return [
            metric.Coco(ground_truth_from_loader=True,
                        keypoint_oks_sigmas=constants.SIGMAS),
            metric.PoseTrack(keypoint_oks_sigmas=constants.SIGMAS),
        ]
