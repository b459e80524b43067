"""Multi-device parity and scaling-harness tests (virtual 8-CPU mesh).

SURVEY.md §4: the reference has no real distributed testing; this framework
adds single-vs-multi-device parity on the same global batch (gradient psum
determinism) and exercises the scaling harness mechanics in CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openpifpaf_tpu.parallel.dryrun import build_tiny_model


def _loss_and_grads(n_devices: int, images, targets):
    """Jitted loss+grads over an n-device data mesh (same global batch)."""
    model, loss_fn = build_tiny_model('shufflenetv2k16')
    model.init(jax.random.key(0), input_hw=(33, 33))
    devices = np.asarray(jax.devices()[:n_devices])
    mesh = Mesh(devices.reshape(n_devices, 1), ('data', 'spatial'))

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P('data'))
    params = jax.tree.map(lambda x: jax.device_put(x, repl),
                          model.variables['params'])
    batch_stats = jax.tree.map(lambda x: jax.device_put(x, repl),
                               model.variables.get('batch_stats', {}))
    images = jax.device_put(images, data_sh)
    targets = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), data_sh), targets)

    def loss_of(p):
        variables = {'params': p, 'batch_stats': batch_stats}
        fields = model.apply(variables, images, train=False)
        total, _ = loss_fn(fields, targets)
        return total

    with mesh:
        total, grads = jax.jit(jax.value_and_grad(loss_of))(params)
        jax.block_until_ready((total, grads))
    return float(total), jax.tree.map(np.asarray, grads)


@pytest.fixture(scope='module')
def global_batch():
    batch, h, w = 8, 33, 33
    fh = fw = 3
    rng = np.random.default_rng(0)
    images = rng.normal(size=(batch, h, w, 3)).astype(np.float32)
    model, _ = build_tiny_model('shufflenetv2k16')

    def target_for(meta):
        f, nv, ns = meta.n_fields, meta.n_vectors, meta.n_scales
        return {
            'conf': rng.uniform(0, 1, (batch, f, fh, fw))
            .astype(np.float32).round(),
            'conf_mask': np.ones((batch, f, fh, fw), bool),
            'vec': rng.normal(size=(batch, f, nv, 2, fh, fw))
            .astype(np.float32),
            'vec_mask': np.ones((batch, f, nv, fh, fw), bool),
            'scale': np.abs(rng.normal(size=(batch, f, ns, fh, fw)))
            .astype(np.float32),
            'scale_mask': np.ones((batch, f, ns, fh, fw), bool),
        }

    return images, [target_for(m) for m in model.head_metas]


def test_single_vs_multi_device_parity(global_batch):
    images, targets = global_batch
    loss_1, grads_1 = _loss_and_grads(1, images, targets)
    loss_8, grads_8 = _loss_and_grads(8, images, targets)

    assert np.isfinite(loss_1)
    np.testing.assert_allclose(loss_1, loss_8, rtol=2e-5)

    flat_1 = jax.tree.leaves(grads_1)
    flat_8 = jax.tree.leaves(grads_8)
    assert len(flat_1) == len(flat_8)
    for g1, g8 in zip(flat_1, flat_8):
        np.testing.assert_allclose(g1, g8, rtol=5e-4, atol=1e-6)


def test_scaling_harness():
    from openpifpaf_tpu.parallel import scaling

    points = scaling.sweep([1, 4], image_hw=(33, 33), batch_per_device=1,
                           n_iters=2)
    assert len(points) == 2
    assert points[0].efficiency == pytest.approx(1.0)
    assert points[1].n_devices == 4
    assert points[1].images_per_s > 0


def test_shard_batch_helper():
    from openpifpaf_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.data_mesh(8)
    batch = {'x': np.arange(16, dtype=np.float32).reshape(8, 2)}
    placed = mesh_mod.shard_batch(mesh, batch)
    assert placed['x'].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(placed['x']), batch['x'])


class TestSpatialCifHr:
    """Spatially-sharded CifHr (parallel/spatial.py) vs the single-device
    oracle: halo composition must be exact when blobs fit the halo."""

    @staticmethod
    def _fields(f=3, h=16, w=12, stride=8, seed=0):
        rng = np.random.default_rng(seed)
        conf = rng.uniform(0, 1, (f, h, w)).astype(np.float32)
        jj, ii = np.mgrid[0:h, 0:w].astype(np.float32)
        # regressed targets near the cell centers (within one stride)
        x_px = (ii[None] + rng.uniform(-1, 1, (f, h, w))) * stride
        y_px = (jj[None] + rng.uniform(-1, 1, (f, h, w))) * stride
        scale_px = rng.uniform(2.0, 8.0, (f, h, w)).astype(np.float32)
        return (conf, x_px.astype(np.float32), y_px.astype(np.float32),
                scale_px)

    @pytest.mark.parametrize('n_bands', [2, 4])
    def test_matches_single_device(self, n_bands):
        from openpifpaf_tpu.ops import cif_hr
        from openpifpaf_tpu.parallel import spatial

        conf, x_px, y_px, scale_px = self._fields()
        out_hw = (64, 48)
        config = cif_hr.CifHrConfig()

        oracle = np.asarray(cif_hr.accumulate(
            jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
            jnp.asarray(scale_px), out_hw=out_hw, config=config))

        devices = np.asarray(jax.devices()[:n_bands])
        mesh = Mesh(devices.reshape(n_bands), ('spatial',))
        sharded = spatial.sharded_cif_hr(
            jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
            jnp.asarray(scale_px), mesh=mesh, out_hw=out_hw, config=config,
            spatial=spatial.SpatialConfig(halo_px=24.0))

        assert int(sharded.halo_overflow) == 0
        np.testing.assert_allclose(np.asarray(sharded.hr), oracle,
                                   rtol=1e-5, atol=1e-5)

    def test_overflow_counter(self):
        from openpifpaf_tpu.ops import cif_hr
        from openpifpaf_tpu.parallel import spatial

        conf, x_px, y_px, scale_px = self._fields()
        # one huge blob that cannot fit any reasonable halo
        scale_px[0, 8, 5] = 500.0
        conf[0, 8, 5] = 0.9

        devices = np.asarray(jax.devices()[:4])
        mesh = Mesh(devices.reshape(4), ('spatial',))
        sharded = spatial.sharded_cif_hr(
            jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
            jnp.asarray(scale_px), mesh=mesh, out_hw=(64, 48),
            config=cif_hr.CifHrConfig(),
            spatial=spatial.SpatialConfig(halo_px=16.0))
        assert int(sharded.halo_overflow) >= 1

    def test_band_divisibility_errors(self):
        from openpifpaf_tpu.ops import cif_hr
        from openpifpaf_tpu.parallel import spatial

        conf, x_px, y_px, scale_px = self._fields(h=15)
        devices = np.asarray(jax.devices()[:2])
        mesh = Mesh(devices.reshape(2), ('spatial',))
        with pytest.raises(ValueError, match='divide'):
            spatial.sharded_cif_hr(
                jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
                jnp.asarray(scale_px), mesh=mesh, out_hw=(63, 48),
                config=cif_hr.CifHrConfig())

    @pytest.mark.parametrize('n_bands', [2, 4])
    def test_sharded_seeds_match(self, n_bands):
        from openpifpaf_tpu.ops import cif_hr, seeds as seeds_mod
        from openpifpaf_tpu.parallel import spatial

        conf, x_px, y_px, scale_px = self._fields()
        out_hw = (64, 48)
        hr_config = cif_hr.CifHrConfig()
        seeds_config = seeds_mod.SeedsConfig(max_seeds=64)

        cifhr = cif_hr.accumulate(
            jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
            jnp.asarray(scale_px), out_hw=out_hw, config=hr_config)
        oracle = seeds_mod.select(
            jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
            jnp.asarray(scale_px), cifhr,
            hr_spacing=float(hr_config.spacing), config=seeds_config)

        devices = np.asarray(jax.devices()[:n_bands])
        mesh = Mesh(devices.reshape(n_bands), ('spatial',))
        sharded = spatial.sharded_seeds(
            jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
            jnp.asarray(scale_px), cifhr, mesh=mesh,
            hr_spacing=float(hr_config.spacing), config=seeds_config,
            spatial=spatial.SpatialConfig(halo_px=24.0))

        n_valid = int(np.sum(np.asarray(oracle.valid)))
        assert n_valid > 0
        np.testing.assert_array_equal(np.asarray(sharded.valid),
                                      np.asarray(oracle.valid))
        for name in ('v', 'f', 'x', 'y', 's'):
            np.testing.assert_allclose(
                np.asarray(getattr(sharded, name))[:n_valid],
                np.asarray(getattr(oracle, name))[:n_valid],
                rtol=1e-5, atol=1e-5, err_msg=name)


def test_data_parallel_eval_parity():
    """--dp-eval: sharded prediction batches must match single-device."""
    from openpifpaf_tpu.predictor import Predictor
    from openpifpaf_tpu.parallel.dryrun import build_tiny_model

    model, _ = build_tiny_model('shufflenetv2k16')
    model.init(jax.random.key(0), input_hw=(65, 65))

    rng = np.random.default_rng(0)
    images = rng.normal(size=(4, 65, 65, 3)).astype(np.float32) * 0.3

    def run(data_parallel):
        saved = (Predictor.data_parallel, Predictor.batch_size)
        Predictor.data_parallel = data_parallel
        Predictor.batch_size = 4
        try:
            predictor = Predictor(model=model)
            placed, n = predictor._place_batch(images)
            assert n == 4
            fields = predictor._forward(predictor.model.variables, placed)
            return predictor.decoder.batch_fields(fields)[:4]
        finally:
            Predictor.data_parallel, Predictor.batch_size = saved

    single = run(False)
    sharded = run(True)
    assert len(single) == len(sharded) == 4
    for anns_s, anns_p in zip(single, sharded):
        assert len(anns_s) == len(anns_p)
        for a, b in zip(anns_s, anns_p):
            np.testing.assert_allclose(a.data, b.data, rtol=1e-4, atol=1e-4)
