"""Evaluation metrics (self-contained COCO OKS/IoU evaluation)."""

from .base import Base
from .coco import Coco
from .cocoeval import CocoEval, DtInstance, GtInstance
from .posetrack import PoseTrack

__all__ = ['Base', 'Coco', 'CocoEval', 'DtInstance', 'GtInstance',
           'PoseTrack']
