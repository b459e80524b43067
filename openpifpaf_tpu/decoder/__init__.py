"""Decoders: on-device field decoding orchestration."""

from .cifcaf import CifCaf
from .cifdet import CifDet
from .decoder import Decoder
from .factory import DECODERS, cli, configure, factory
from .multi import Multi
from .pose_similarity import PoseSimilarity
from .tracking_pose import TrackingPose

__all__ = ['CifCaf', 'CifDet', 'Decoder', 'DECODERS', 'cli', 'configure',
           'factory', 'Multi', 'PoseSimilarity', 'TrackingPose']
