"""Tripwire tests for --debug-checks (checkify runtime assertions).

SURVEY §5.2: the TPU substitute for the reference's sanitizer/anomaly
tooling.  Disabled (default): zero checks traced, programs behave exactly
as before.  Enabled: NaN inputs and non-finite losses raise instead of
silently corrupting downstream results.
"""

import argparse

import numpy as np
import pytest

from openpifpaf_tpu import debug_checks, logger


@pytest.fixture
def checks_enabled():
    debug_checks.enable(True)
    yield
    debug_checks.enable(False)


def test_disabled_is_plain_jit():
    import jax.numpy as jnp

    assert not debug_checks.enabled()

    def f(x):
        debug_checks.check_finite(x, 'nope')
        return x * 2

    out = debug_checks.checked_jit(f)(jnp.float32(np.nan))
    assert np.isnan(float(out))   # no error: checks are not even traced


def test_finite_tripwire(checks_enabled):
    import jax.numpy as jnp

    def f(x):
        debug_checks.check_finite(x, 'non-finite input')
        return x * 2

    g = debug_checks.checked_jit(f)
    assert float(g(jnp.float32(3.0))) == 6.0
    with pytest.raises(Exception, match='non-finite input'):
        g(jnp.float32(np.nan))


def test_decode_gather_nan_tripwire(checks_enabled):
    import jax.numpy as jnp
    from openpifpaf_tpu.ops import common

    def f(grids, x):
        return common.gather_field(grids, jnp.zeros((2,), jnp.int32),
                                   x, jnp.ones((2,)))

    g = debug_checks.checked_jit(f)
    grids = jnp.ones((3, 8, 8))
    g(grids, jnp.ones((2,)))  # fine
    with pytest.raises(Exception, match='non-finite x'):
        g(grids, jnp.array([1.0, np.nan]))


def test_decode_pipeline_nan_tripwire(checks_enabled):
    """A NaN CIF field must raise through the full batched decoder."""
    import sys
    sys.modules.pop('test_decoder', None)
    from test_decoder import build_fields, metas, synthetic_pose
    from openpifpaf_tpu import ops

    cif, caf = build_fields([synthetic_pose(scale=16.0)])
    cif[0, 1, 5, 5] = np.nan   # NaN regression offset
    cif_meta, caf_meta = metas()
    config = ops.CifCafConfig(stride=16, image_hw=(321, 321))
    decode = ops.make_batch_decoder(cif_meta=cif_meta, caf_meta=caf_meta,
                                    config=config)
    with pytest.raises(Exception, match='non-finite'):
        decode(cif[None], caf[None])


def test_train_loss_tripwire(checks_enabled):
    """NaN images -> non-finite loss -> the checked train step raises."""
    import jax
    import jax.numpy as jnp

    def train_step(w, x):
        def loss_fn(w):
            total = (w * x).sum()
            debug_checks.check_finite(total, 'non-finite training loss')
            return total
        loss, grads = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * grads, loss

    step = debug_checks.checked_jit(train_step)
    w = jnp.ones((4,))
    w, loss = step(w, jnp.ones((4,)))
    assert np.isfinite(float(loss))
    with pytest.raises(Exception, match='non-finite training loss'):
        step(w, jnp.full((4,), np.nan))


def test_cli_flag_round_trip():
    parser = argparse.ArgumentParser()
    logger.cli(parser)
    args = parser.parse_args(['--debug-checks'])
    try:
        logger.configure(args)
        assert debug_checks.enabled()
    finally:
        debug_checks.enable(False)
    args = parser.parse_args([])
    logger.configure(args)
    assert not debug_checks.enabled()
