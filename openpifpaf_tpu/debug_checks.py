"""Runtime NaN/Inf and out-of-bounds observability (``--debug-checks``).

SURVEY.md §5.2: the reference relies on CUDA sanitizers / torch anomaly
detection; the TPU-side substitute is ``jax.experimental.checkify`` —
functionalized runtime assertions that survive ``jit``/``vmap`` and
surface on the host as Python exceptions.

Off by default (zero cost: the checks are not even traced).  Enabled by
``--debug-checks`` (or ``--debug``), they add:

- finite-loss tripwire in the jitted train/val steps
  (``training/trainer.py``),
- finite-coordinate + field-index bounds checks in the decode gather
  primitives (``ops/common.py``),
- automatic NaN/Inf/div-by-zero checks (``checkify.float_checks``) and
  gather/scatter OOB checks (``checkify.index_checks``) over every wrapped
  program.

Pattern: guard ``checkify.check`` calls with ``enabled()`` at *trace*
time, and wrap the outermost jitted program with :func:`checked_jit` so
the checks are discharged and thrown.
"""

from __future__ import annotations

import argparse
import functools
import logging

LOG = logging.getLogger(__name__)

_ENABLED = False


def enabled() -> bool:
    return _ENABLED


def enable(value: bool = True) -> None:
    global _ENABLED
    _ENABLED = bool(value)


def cli(parser: argparse.ArgumentParser) -> None:
    group = parser.add_argument_group('debug checks')
    group.add_argument('--debug-checks', default=False, action='store_true',
                       help='enable checkify NaN/Inf/OOB runtime assertions '
                            'in jitted programs (slower; also enabled by '
                            '--debug)')


def configure(args: argparse.Namespace) -> None:
    enable(getattr(args, 'debug_checks', False)
           or getattr(args, 'debug', False))
    if enabled():
        LOG.info('checkify runtime assertions enabled')


def check(pred, msg: str, **fmt) -> None:
    """``checkify.check`` that vanishes (not traced) unless enabled."""
    if not _ENABLED:
        return
    from jax.experimental import checkify
    checkify.check(pred, msg, **fmt)


def check_finite(x, msg: str) -> None:
    """Assert every element of ``x`` is finite (when enabled)."""
    if not _ENABLED:
        return
    import jax.numpy as jnp
    from jax.experimental import checkify
    checkify.check(jnp.all(jnp.isfinite(x)), msg)


def checked_jit(fn, **jit_kwargs):
    """``jax.jit(fn)`` that discharges checkify errors and throws.

    When checks are disabled this is exactly ``jax.jit(fn)`` — same
    signature, same donation, no checkify in the trace.
    """
    import jax

    if not _ENABLED:
        return jax.jit(fn, **jit_kwargs)

    from jax.experimental import checkify
    errors = (checkify.user_checks | checkify.float_checks
              | checkify.index_checks)
    checked = jax.jit(checkify.checkify(fn, errors=errors), **jit_kwargs)

    @functools.wraps(fn)
    def run(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        checkify.check_error(err)   # raises JaxRuntimeError on failure
        return out
    return run
