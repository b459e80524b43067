"""On-device decoder ops: the TPU-native replacement for the reference's
C++ decoder (``src/openpifpaf/csrc/``)."""

from . import caf_scored, cif_hr, common, growth, nms, pipeline, seeds, \
    sequential_oracle, tracking
from .pipeline import CifCafConfig, DecodedPoses, decode_cifcaf_single, \
    make_batch_decoder
from .tracking import TrackingConfig, make_associator

__all__ = [
    'caf_scored', 'cif_hr', 'common', 'growth', 'nms', 'pipeline', 'seeds',
    'sequential_oracle', 'tracking', 'CifCafConfig', 'DecodedPoses',
    'decode_cifcaf_single', 'make_batch_decoder', 'TrackingConfig',
    'make_associator',
]
