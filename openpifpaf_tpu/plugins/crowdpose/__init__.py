"""CrowdPose plugin: 14-keypoint crowded-scene pose estimation.

Reference parity: ``src/openpifpaf/plugins/crowdpose/`` — a CocoKp-shaped
datamodule over the CrowdPose COCO-format annotations.  Evaluation follows
the crowdposetools protocol: AP broken down by per-image crowd-index band
(easy < 0.1 <= medium < 0.8 <= hard) instead of instance area.
"""

import os

from . import constants
from ..generic_kp import GenericKpDataModule
from ... import metric


class CrowdPose(GenericKpDataModule):
    name = 'crowdpose'
    keypoints = constants.KEYPOINTS
    sigmas = constants.SIGMAS
    skeleton = constants.SKELETON
    hflip = constants.HFLIP
    upright_pose = constants.UPRIGHT_POSE

    train_annotations = 'data-crowdpose/json/crowdpose_train.json'
    val_annotations = 'data-crowdpose/json/crowdpose_val.json'
    eval_annotations = 'data-crowdpose/json/crowdpose_test.json'
    train_image_dir = 'data-crowdpose/images/'
    val_image_dir = 'data-crowdpose/images/'
    eval_image_dir = 'data-crowdpose/images/'

    def metrics(self):
        ann_file = self.eval_annotations or self.val_annotations
        have_file = ann_file and os.path.exists(ann_file)
        return [metric.Coco(
            ann_file=ann_file if have_file else None,
            ground_truth_from_loader=not have_file,
            iou_type='keypoints',
            keypoint_oks_sigmas=self.sigmas,
            # crowdposetools breakdown (APE/APM/APH) needs the per-image
            # crowdIndex from the annotation file
            crowd_index_groups=have_file)]


def register():
    from ...datasets.factory import DATAMODULES

    DATAMODULES['crowdpose'] = CrowdPose
