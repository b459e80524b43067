"""Profiling helpers.

Reference parity: ``src/openpifpaf/profiler.py:~10`` and the
``--profile-decoder`` flag in ``decoder/decoder.py:~60`` — the reference
wraps decode in torch autograd profiler + cProfile and dumps a table.
TPU equivalent: ``jax.profiler`` traces (XProf/Perfetto, includes device
kernels and HBM usage) plus host-side cProfile, behind the same flag
shapes.
"""

from __future__ import annotations

import argparse
import contextlib
import cProfile
import logging
import pstats

LOG = logging.getLogger(__name__)


class Profiler:
    """Combined device-trace + host-cProfile context.

    With ``trace_dir`` set, a ``jax.profiler`` trace is collected there
    (open with XProf/TensorBoard or Perfetto).  ``out_name`` gets the host
    cProfile table.
    """

    trace_dir = None
    enabled = False

    def __init__(self, out_name: str = 'decoder.prof',
                 trace_dir: str = None):
        self.out_name = out_name
        self.trace_dir = trace_dir if trace_dir is not None \
            else type(self).trace_dir
        self._profile = None

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('profiler')
        group.add_argument('--profile', default=None, nargs='?',
                           const='profile_trace',
                           help='collect a jax.profiler device trace into '
                                'this directory')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.trace_dir = args.profile
        cls.enabled = args.profile is not None

    @contextlib.contextmanager
    def __call__(self):
        import jax

        ctx = contextlib.ExitStack()
        with ctx:
            if self.trace_dir:
                ctx.enter_context(jax.profiler.trace(self.trace_dir))
                LOG.info('jax profiler trace -> %s', self.trace_dir)
            profile = cProfile.Profile()
            profile.enable()
            try:
                yield self
            finally:
                profile.disable()
                profile.dump_stats(self.out_name)
                stats = pstats.Stats(profile)
                stats.sort_stats('cumulative')
                LOG.info('host profile written to %s (top entries follow)',
                         self.out_name)
                stats.print_stats(10)


class TraceAnnotation:
    """Named region in the device trace (jax.profiler.TraceAnnotation)."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        import jax

        self._ctx = jax.profiler.TraceAnnotation(self.name)
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)
