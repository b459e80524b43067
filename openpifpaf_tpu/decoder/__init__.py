"""Decoders: on-device field decoding orchestration."""

from .cifcaf import CifCaf
from .cifdet import CifDet
from .decoder import Decoder
from .factory import DECODERS, cli, configure, factory
from .multi import Multi

__all__ = ['CifCaf', 'CifDet', 'Decoder', 'DECODERS', 'cli', 'configure',
           'factory', 'Multi']
