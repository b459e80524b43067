"""COCO keypoint / detection plugin.

Reference parity: ``src/openpifpaf/plugins/coco/``.
"""

from . import constants


def register():
    # registration of the datamodules happens lazily once the datasets
    # subsystem exists; constants are importable immediately.
    from .cocokp import CocoKp  # pylint: disable=import-outside-toplevel
    from .cocodet import CocoDet  # pylint: disable=import-outside-toplevel
    from ...datasets import DATAMODULES  # pylint: disable=import-outside-toplevel
    DATAMODULES['cocokp'] = CocoKp
    DATAMODULES['cocodet'] = CocoDet
