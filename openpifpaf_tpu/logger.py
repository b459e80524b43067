"""Logging configuration.

Reference parity: ``src/openpifpaf/logger.py:~15`` — ``--debug``,
``--quiet``, version stamping.
"""

from __future__ import annotations

import argparse
import logging
import sys


def cli(parser: argparse.ArgumentParser) -> None:
    group = parser.add_argument_group('logging')
    group.add_argument('--debug', default=False, action='store_true',
                       help='print debug messages (also enables checkify '
                            'runtime assertions)')
    group.add_argument('-q', '--quiet', default=False, action='store_true',
                       help='only warnings and errors')
    group.add_argument('--log-stats', default=False, action='store_true',
                       help='enable stats logging')
    from . import debug_checks
    debug_checks.cli(parser)


def configure(args: argparse.Namespace, logger=None) -> None:
    level = logging.INFO
    if args.debug:
        level = logging.DEBUG
    elif args.quiet:
        level = logging.WARNING
    logging.basicConfig(stream=sys.stdout, level=level,
                        format='%(levelname)s:%(name)s:%(message)s')
    from . import __version__
    logging.getLogger(__name__).info('openpifpaf_tpu %s', __version__)
    from . import debug_checks
    debug_checks.configure(args)
