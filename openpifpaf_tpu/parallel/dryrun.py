"""Multi-device training-step dry run (compile + one step on tiny shapes).

Used by ``__graft_entry__.dryrun_multichip`` and by tests on the virtual
CPU mesh: builds the flagship model, shards the batch over a
``(data, spatial)`` mesh (data parallel + spatial sharding of image rows —
XLA inserts conv halo exchanges), replicates parameters and runs one full
jitted train step (forward, loss, grad psum, optimizer update, EMA).
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOG = logging.getLogger(__name__)


def build_tiny_model(basenet: str = 'shufflenetv2k16'):
    from .. import headmeta, losses, models
    from ..plugins.coco import constants

    cif = headmeta.Cif('cif', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name=basenet, bf16=False)
    model = factory.from_scratch(basenet, [cif, caf])
    loss_fn = losses.Factory().factory(model.head_metas)
    return model, loss_fn


def dryrun_multichip(n_devices: int, *, image_hw=(64, 64),
                     basenet: str = 'shufflenetv2k16') -> None:
    """Compile + run ONE sharded training step on ``n_devices`` devices."""
    import optax

    from ..training.optimize import OptimizeFactory

    devices = np.asarray(jax.devices()[:n_devices])
    spatial = 2 if n_devices % 2 == 0 and n_devices >= 4 else 1
    mesh = Mesh(devices.reshape(n_devices // spatial, spatial),
                ('data', 'spatial'))
    LOG.info('dryrun mesh: %s', mesh)

    model, loss_fn = build_tiny_model(basenet)
    model.init(jax.random.key(0), input_hw=image_hw)

    opt_factory = OptimizeFactory()
    schedule = opt_factory.schedule(steps_per_epoch=10)
    tx = opt_factory.optimizer(schedule)

    params = model.variables['params']
    batch_stats = model.variables.get('batch_stats', {})
    opt_state = tx.init({'params': params})
    ema = jax.tree.map(jnp.copy, params)

    batch = mesh.shape['data']
    h, w = image_hw
    fh, fw = (h - 1) // 16 + 1, (w - 1) // 16 + 1
    rng = np.random.default_rng(0)
    images = rng.normal(size=(batch, h, w, 3)).astype(np.float32)

    def target_for(meta):
        f, nv, ns = meta.n_fields, meta.n_vectors, meta.n_scales
        return {
            'conf': rng.uniform(0, 1, (batch, f, fh, fw)).astype(np.float32)
            .round(),
            'conf_mask': np.ones((batch, f, fh, fw), bool),
            'vec': rng.normal(size=(batch, f, nv, 2, fh, fw)).astype(np.float32),
            'vec_mask': np.ones((batch, f, nv, fh, fw), bool),
            'scale': np.abs(rng.normal(size=(batch, f, ns, fh, fw))
                            ).astype(np.float32),
            'scale_mask': np.ones((batch, f, ns, fh, fw), bool),
        }

    targets = [target_for(m) for m in model.head_metas]

    repl = NamedSharding(mesh, P())
    img_sharding = NamedSharding(mesh, P('data', 'spatial'))
    tgt_sharding = NamedSharding(mesh, P('data'))

    images = jax.device_put(images, img_sharding)
    targets = jax.tree.map(
        lambda x: jax.device_put(np.asarray(x), tgt_sharding), targets)
    params = jax.tree.map(lambda x: jax.device_put(x, repl), params)
    batch_stats = jax.tree.map(lambda x: jax.device_put(x, repl), batch_stats)
    opt_state = jax.tree.map(lambda x: jax.device_put(x, repl), opt_state)
    ema = jax.tree.map(lambda x: jax.device_put(x, repl), ema)

    def train_step(params, batch_stats, opt_state, ema, images, targets):
        def loss_of(p):
            variables = {'params': p}
            if batch_stats:
                variables['batch_stats'] = batch_stats
                fields, mutated = model.apply(variables, images, train=True,
                                              mutable=['batch_stats'])
                new_stats = mutated['batch_stats']
            else:
                fields = model.apply(variables, images, train=True)
                new_stats = batch_stats
            total, comps = loss_fn(fields, targets)
            return total, (jnp.stack(comps), new_stats)

        (total, (comps, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        updates, new_opt_state = tx.update({'params': grads},
                                           opt_state, {'params': params})
        new_params = optax.apply_updates({'params': params},
                                         updates)['params']
        new_ema = jax.tree.map(lambda e, p: 0.99 * e + 0.01 * p, ema,
                               new_params)
        return new_params, new_stats, new_opt_state, new_ema, total, comps

    step = jax.jit(train_step)
    with mesh:
        out = step(params, batch_stats, opt_state, ema, images, targets)
        jax.block_until_ready(out)
    total = float(out[-2])
    LOG.info('dryrun step done: loss=%f devices=%d', total, n_devices)
    assert np.isfinite(total), total
