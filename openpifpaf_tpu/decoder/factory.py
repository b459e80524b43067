"""Decoder registry and factory.

Reference parity: ``src/openpifpaf/decoder/factory.py:~20`` — ``DECODERS``
registry; decoder classes are matched against checkpoint head metas.
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Set, Type

from .cifcaf import CifCaf
from .cifdet import CifDet
from .decoder import Decoder
from .multi import Multi
from .pose_similarity import PoseSimilarity
from .tracking_pose import TrackingPose

LOG = logging.getLogger(__name__)

DECODERS: Set[Type[Decoder]] = {CifCaf, CifDet, TrackingPose, PoseSimilarity}


def cli(parser: argparse.ArgumentParser) -> None:
    group = parser.add_argument_group('decoder')
    group.add_argument('--decoder', default=None, nargs='+',
                       help='decoder names to instantiate '
                            '(e.g. cifcaf, cifdet); default: by head metas')
    group.add_argument('--profile-decoder', default=None, nargs='?',
                       const='decoder.prof',
                       help='profile the decode step into this file')
    group.add_argument('--decoder-workers', default=None, type=int,
                       help='(compatibility) the reference decodes in CPU '
                            'worker processes; here decode runs on-device '
                            'inside the jitted program, so this flag is '
                            'accepted but has no effect')
    for decoder in DECODERS:
        decoder.cli(parser)


_requested_decoders = None  # names from --decoder (None = by head metas)


def configure(args: argparse.Namespace) -> None:
    global _requested_decoders  # pylint: disable=global-statement
    Decoder.profile = args.profile_decoder
    _requested_decoders = ([n.lower() for n in args.decoder]
                           if args.decoder else None)
    if getattr(args, 'decoder_workers', None):
        LOG.warning('--decoder-workers has no effect: fields are decoded '
                    'on-device inside the jitted forward program '
                    '(no CPU worker pool to size)')
    for decoder in DECODERS:
        decoder.configure(args)


def factory(head_metas) -> Decoder:
    """Build the decoder(s) matching the model's head metas.

    With ``--decoder`` set, only the named decoder classes are considered
    (reference ``decoder/factory.py:~20`` ``--decoder`` selection).
    """
    classes = DECODERS
    if _requested_decoders is not None:
        classes = [c for c in DECODERS
                   if c.__name__.lower() in _requested_decoders]
        if not classes:
            raise ValueError(
                f'--decoder {_requested_decoders} matched none of '
                f'{sorted(c.__name__.lower() for c in DECODERS)}')
    decoders = [d for decoder_class in classes
                for d in decoder_class.factory(head_metas)]
    if any(isinstance(d, TrackingPose) for d in decoders):
        # the tracking decoder subsumes the plain CifCaf decode of the
        # same heads (reference: TrackingPose takes precedence)
        decoders = [d for d in decoders if not type(d) is CifCaf]  # noqa: E721
    if not decoders:
        raise ValueError(
            f'no decoder found for head metas '
            f'{[type(m).__name__ for m in head_metas]}')
    if len(decoders) == 1:
        return decoders[0]
    LOG.info('multiple decoders matched: %s', decoders)
    return Multi(decoders)
