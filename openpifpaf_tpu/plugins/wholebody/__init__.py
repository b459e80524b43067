"""WholeBody plugin: COCO WholeBody 133-keypoint pose estimation.

Reference parity: ``src/openpifpaf/plugins/wholebody/`` — body + feet +
face + hands keypoints over COCO images with WholeBody annotations.  The
dense 133-kp skeleton is the decoder stress test (SURVEY.md §7 step 9:
stresses the static MAX_* budgets and kernel sizes).
"""

from . import constants
from ..generic_kp import GenericKpDataModule


class WholeBody(GenericKpDataModule):
    name = 'wholebody'
    keypoints = constants.KEYPOINTS
    sigmas = constants.SIGMAS
    skeleton = constants.SKELETON
    hflip = constants.HFLIP
    upright_pose = constants.UPRIGHT_POSE

    train_annotations = ('data-mscoco/annotations/'
                         'coco_wholebody_train_v1.0.json')
    val_annotations = 'data-mscoco/annotations/coco_wholebody_val_v1.0.json'
    eval_annotations = val_annotations
    train_image_dir = 'data-mscoco/images/train2017/'
    val_image_dir = 'data-mscoco/images/val2017/'
    eval_image_dir = val_image_dir


def register():
    from ...datasets.factory import DATAMODULES

    DATAMODULES['wholebody'] = WholeBody
