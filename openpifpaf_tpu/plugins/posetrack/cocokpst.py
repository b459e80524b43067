"""Single-frame keypoint data as pseudo-tracking frame pairs.

Reference parity: ``src/openpifpaf/plugins/posetrack/cocokpst.py:~30`` —
converts COCO single images into (previous, current) frame pairs with
simulated camera/subject motion, adding a ``Tcaf`` head meta, so tracking
models can be (pre)trained without video data.

``CocoKpSt`` wraps the real COCO keypoint data (needs the COCO download);
``ToyKpSt`` (``toykpst.py``) is the synthetic seconds-fast equivalent used
by tests, mirroring the reference's cifar10-for-CI strategy.
"""

from __future__ import annotations

import argparse

from ..coco import constants as coco_constants
from ..coco.cocokp import CocoKp
from ..coco.dataset import CocoDataset
from ... import encoder, headmeta, metric, transforms
from ...datasets import (DataModule, Loader,
                         collate_tracking_images_anns_meta,
                         collate_tracking_images_targets_meta)


def tracking_head_metas(dataset_name: str, *, keypoints, sigmas, pose,
                        skeleton, score_weights=None):
    """The standard tracking head set: single-frame CIF+CAF plus TCAF."""
    cif = headmeta.Cif('cif', dataset_name,
                       keypoints=keypoints, sigmas=sigmas, pose=pose,
                       draw_skeleton=skeleton, score_weights=score_weights)
    caf = headmeta.Caf('caf', dataset_name,
                       keypoints=keypoints, sigmas=sigmas, pose=pose,
                       skeleton=skeleton)
    tcaf = headmeta.Tcaf('tcaf', dataset_name,
                         keypoints_single_frame=keypoints,
                         sigmas_single_frame=sigmas,
                         pose_single_frame=pose,
                         draw_skeleton_single_frame=skeleton,
                         keypoints=list(keypoints) + list(keypoints),
                         sigmas=list(sigmas) + list(sigmas))
    return [cif, caf, tcaf]


class _PairEval:
    """Eval adapter: make a pair, keep the current frame's ground truth."""

    def __init__(self, pair_transform):
        self.pair_transform = pair_transform

    def __call__(self, image, anns, meta):
        images, anns_pair, meta = self.pair_transform(image, anns, meta)
        return images, anns_pair[1], meta


class CocoKpSt(DataModule):
    """COCO keypoints as pseudo-tracking pairs (real COCO data required)."""

    square_edge = 385
    max_shift = 30.0

    def __init__(self):
        self.head_metas = tracking_head_metas(
            'cocokpst',
            keypoints=coco_constants.COCO_KEYPOINTS,
            sigmas=coco_constants.COCO_PERSON_SIGMAS,
            pose=coco_constants.COCO_UPRIGHT_POSE,
            skeleton=coco_constants.COCO_PERSON_SKELETON,
            score_weights=coco_constants.COCO_PERSON_SCORE_WEIGHTS)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('data module CocoKpSt')
        group.add_argument('--cocokpst-square-edge', default=cls.square_edge,
                           type=int)
        group.add_argument('--cocokpst-max-shift', default=cls.max_shift,
                           type=float, help='simulated camera shift in px')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.square_edge = args.cocokpst_square_edge
        cls.max_shift = args.cocokpst_max_shift

    def _normalize(self):
        return transforms.NormalizeAnnotations(
            keypoints=coco_constants.COCO_KEYPOINTS,
            skeleton=coco_constants.COCO_PERSON_SKELETON,
            sigmas=coco_constants.COCO_PERSON_SIGMAS,
            score_weights=coco_constants.COCO_PERSON_SCORE_WEIGHTS)

    def _preprocess(self):
        return transforms.Compose([
            self._normalize(),
            transforms.RescaleAbsolute(self.square_edge),
            transforms.CenterPad(self.square_edge),
            transforms.TRAIN_TRANSFORM,
            transforms.ImageToTracking(max_shift_px=self.max_shift),
            encoder.TrackingEncoders(encoder.factory(self.head_metas)),
        ])

    def _eval_preprocess(self):
        return transforms.Compose([
            self._normalize(),
            transforms.RescaleAbsolute(self.square_edge),
            transforms.CenterPad(self.square_edge),
            transforms.EVAL_TRANSFORM,
            _PairEval(transforms.ImageToTracking(max_shift_px=self.max_shift,
                                                 seed=123)),
        ])

    def train_loader(self):
        dataset = CocoDataset(
            CocoKp.train_image_dir, CocoKp.train_annotations,
            preprocess=self._preprocess(), annotation_filter=True,
            min_kp_anns=1, category_ids=[1])
        return Loader(dataset, batch_size=self.batch_size, shuffle=True,
                      collate_fn=collate_tracking_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def val_loader(self):
        dataset = CocoDataset(
            CocoKp.val_image_dir, CocoKp.val_annotations,
            preprocess=self._preprocess(), annotation_filter=True,
            min_kp_anns=1, category_ids=[1])
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_tracking_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def eval_loader(self):
        dataset = CocoDataset(
            CocoKp.eval_image_dir, CocoKp.eval_annotations,
            preprocess=self._eval_preprocess(), annotation_filter=True,
            min_kp_anns=1, category_ids=[1])
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_tracking_images_anns_meta,
                      num_workers=self.loader_workers, drop_last=False)

    def metrics(self):
        return [
            metric.Coco(ground_truth_from_loader=True,
                        keypoint_oks_sigmas=coco_constants.COCO_PERSON_SIGMAS),
            metric.PoseTrack(keypoint_oks_sigmas=coco_constants.COCO_PERSON_SIGMAS),
        ]
