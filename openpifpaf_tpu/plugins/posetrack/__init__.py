"""PoseTrack plugin: video pose tracking datamodules.

Reference parity: ``src/openpifpaf/plugins/posetrack/`` — PoseTrack2018
sequences, COCO-as-pseudo-tracking (``cocokpst``) and, specific to this
framework, a synthetic seconds-fast tracking workload (``toykpst``) for CI.
"""

from .cocokpst import CocoKpSt
from .posetrack2018 import PoseTrack2018
from .toykpst import ToyKpSt


def register():
    from ...datasets.factory import DATAMODULES

    DATAMODULES['cocokpst'] = CocoKpSt
    DATAMODULES['posetrack2018'] = PoseTrack2018
    DATAMODULES['toykpst'] = ToyKpSt
