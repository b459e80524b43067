"""Pallas kernel tests (interpreter mode on the CPU CI mesh).

The fused CifHr splat kernel must match the XLA einsum path
(``ops/cif_hr.accumulate``) exactly — the einsum implementation is the
oracle.  On TPU the kernel runs compiled; here it runs interpreted.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openpifpaf_tpu.ops import cif_hr
from openpifpaf_tpu.ops.pallas_cif_hr import accumulate_pallas


def synthetic_inputs(seed=0, f=5, h=9, w=9):
    rng = np.random.default_rng(seed)
    conf = rng.uniform(0, 1, (f, h, w)).astype(np.float32)
    jj, ii = np.mgrid[0:h, 0:w].astype(np.float32)
    x_px = ((ii[None] + rng.normal(0, 0.5, (f, h, w))) * 16.0
            ).astype(np.float32)
    y_px = ((jj[None] + rng.normal(0, 0.5, (f, h, w))) * 16.0
            ).astype(np.float32)
    scale_px = np.abs(rng.normal(30, 10, (f, h, w))).astype(np.float32)
    return conf, x_px, y_px, scale_px


@pytest.mark.parametrize('seed', [0, 1])
def test_matches_einsum_path(seed):
    conf, x_px, y_px, scale_px = synthetic_inputs(seed)
    f, h, w = conf.shape
    hh = wh = (h - 1) * 16 // 2 + 1
    # f32 profiles: the pallas kernel is compared against the exact path
    config = cif_hr.CifHrConfig(use_pallas=False, profile_bf16=False)

    want = np.asarray(cif_hr.accumulate(
        jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
        jnp.asarray(scale_px), out_hw=(hh, wh), config=config))

    n = h * w
    mask = conf > config.v_threshold
    v = np.where(mask, conf * config.neighbor_factor, 0.0).reshape(f, n)
    sigma = np.maximum(config.min_sigma_px,
                       config.sigma_factor * scale_px).reshape(f, n)
    got = np.asarray(accumulate_pallas(
        jnp.asarray(v), jnp.asarray(x_px.reshape(f, n)),
        jnp.asarray(y_px.reshape(f, n)), jnp.asarray(sigma),
        out_hw=(hh, wh), spacing=float(config.spacing),
        truncate=config.truncate, interpret=True))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_all_masked_cells_zero():
    f, n = 3, 16
    hh = wh = 40
    out = np.asarray(accumulate_pallas(
        jnp.zeros((f, n)), jnp.zeros((f, n)), jnp.zeros((f, n)),
        jnp.ones((f, n)), out_hw=(hh, wh), spacing=2.0, interpret=True))
    assert out.shape == (f, hh, wh)
    np.testing.assert_array_equal(out, 0.0)


class TestGatherFieldGroupedMXU:
    """The MXU einsum bilinear (TPU path of gather_field_grouped) must be
    exactly equivalent to the 4-corner gather (CPU path / oracle)."""

    def test_matches_gather(self):
        import jax.numpy as jnp
        from openpifpaf_tpu.ops import common

        rng = np.random.default_rng(0)
        grids = jnp.asarray(rng.normal(size=(17, 161, 161)).astype(np.float32))
        group = jnp.asarray(rng.integers(0, 17, size=(19,)).astype(np.int32))
        # include out-of-range coords (clamped reads on both paths)
        x = jnp.asarray(rng.uniform(-10, 340, size=(19, 21, 21)).astype(np.float32))
        y = jnp.asarray(rng.uniform(-10, 340, size=(19, 21, 21)).astype(np.float32))

        got = common._gather_field_grouped_mxu(grids, group, x, y, 2.0,
                                               bf16=False)
        fb = jnp.broadcast_to(group[:, None, None], x.shape)
        want = common.gather_field(grids, fb, x, y, 2.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
        # the bf16 production path: stencil rounding only (~2^-9 relative
        # on unit-scale grids -> absolute here)
        got16 = common._gather_field_grouped_mxu(grids, group, x, y, 2.0,
                                                 bf16=True)
        np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                                   atol=0.05, rtol=0.02)

    def test_exact_grid_points(self):
        import jax.numpy as jnp
        from openpifpaf_tpu.ops import common

        grids = jnp.arange(2 * 5 * 7, dtype=jnp.float32).reshape(2, 5, 7)
        group = jnp.asarray([1, 0], jnp.int32)
        x = jnp.asarray([[0.0, 6.0], [3.0, 2.5]])   # spacing 1
        y = jnp.asarray([[0.0, 4.0], [2.0, 1.5]])
        got = common._gather_field_grouped_mxu(grids, group, x, y, 1.0,
                                               bf16=False)
        fb = jnp.broadcast_to(group[:, None], x.shape)
        want = common.gather_field(grids, fb, x, y, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
