"""On-device decoder ops: the TPU-native replacement for the reference's
C++ decoder (``src/openpifpaf/csrc/``)."""

from . import caf_scored, cif_hr, common, growth, nms, pipeline, seeds
from .pipeline import CifCafConfig, DecodedPoses, decode_cifcaf_single, \
    make_batch_decoder

__all__ = [
    'caf_scored', 'cif_hr', 'common', 'growth', 'nms', 'pipeline', 'seeds',
    'CifCafConfig', 'DecodedPoses', 'decode_cifcaf_single',
    'make_batch_decoder',
]
