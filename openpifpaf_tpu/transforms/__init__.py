"""Preprocessing transforms (PIL/numpy, host-side).

Reference parity: ``src/openpifpaf/transforms/`` — same composable
``Preprocess`` contract with invertible meta tracking.
``EVAL_TRANSFORM``/``TRAIN_TRANSFORM`` mirror ``transforms/__init__.py:~20``
(ImageNet normalization at the tensor boundary).
"""

from .annotations import NormalizeAnnotations
from .compose import Compose
from .crop import Crop
from .hflip import HFlip, HorizontalSwap
from .image import (Blur, ColorTint, ImageToNumpy, JpegCompression,
                    IMAGENET_MEAN, IMAGENET_STD)
from .minsize import MinSize
from .multi_scale import MultiScale
from .pad import CenterPad, CenterPadTight
from .pair import ImageToTracking, SingleImage, SyncPair
from .preprocess import AnnotationCopy, Preprocess
from .random import DeterministicEqualChoice, RandomApply, RandomChoice
from .rotate import RotateBy90, RotateUniform
from .scale import RescaleAbsolute, RescaleRelative, ScaleMix
from .toannotations import (ToAnnotations, ToCrowdAnnotations,
                            ToDetAnnotations, ToKpAnnotations)
from .unclipped import UnclippedArea, UnclippedSides
from .video import Deinterlace, ImputeNaN

# the tensor boundary used by all loaders
EVAL_TRANSFORM = ImageToNumpy()
TRAIN_TRANSFORM = ImageToNumpy()

__all__ = [
    'NormalizeAnnotations', 'Compose', 'Crop', 'HFlip', 'HorizontalSwap',
    'Blur', 'ColorTint', 'ImageToNumpy', 'JpegCompression',
    'IMAGENET_MEAN', 'IMAGENET_STD', 'MinSize', 'MultiScale', 'CenterPad',
    'CenterPadTight', 'AnnotationCopy', 'Preprocess',
    'ImageToTracking', 'SingleImage', 'SyncPair',
    'DeterministicEqualChoice', 'RandomApply', 'RandomChoice',
    'RotateBy90', 'RotateUniform', 'RescaleAbsolute', 'RescaleRelative',
    'ScaleMix', 'ToAnnotations', 'ToCrowdAnnotations', 'ToDetAnnotations',
    'ToKpAnnotations', 'UnclippedArea', 'UnclippedSides',
    'Deinterlace', 'ImputeNaN',
    'EVAL_TRANSFORM', 'TRAIN_TRANSFORM',
]
