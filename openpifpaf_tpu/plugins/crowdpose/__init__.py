"""CrowdPose plugin: 14-keypoint crowded-scene pose estimation.

Reference parity: ``src/openpifpaf/plugins/crowdpose/`` — a CocoKp-shaped
datamodule over the CrowdPose COCO-format annotations.
"""

from . import constants
from ..generic_kp import GenericKpDataModule


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


def register():
    from ...datasets.factory import DATAMODULES

    DATAMODULES['crowdpose'] = CrowdPose
