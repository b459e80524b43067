"""Scaling-efficiency measurement: throughput at 1 device vs an N-device mesh.

BASELINE.json asks for frames/s efficiency at 1 chip, 1 host and N>=2
hosts with >=80% scaling efficiency.  This harness measures weak-scaling
throughput of the full jitted train step (forward, loss, grads with the
XLA-inserted gradient psum over the ``data`` axis, optimizer, EMA): the
global batch grows with the device count, so perfect scaling keeps the step
time constant.

On the virtual CPU mesh this validates the *mechanics* (sharding compiles,
collectives run, efficiency is computable); real efficiency numbers come
from running the same harness on TPU hardware.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import List

import jax
import numpy as np

LOG = logging.getLogger(__name__)


@dataclasses.dataclass
class ScalingPoint:
    n_devices: int
    global_batch: int
    step_time_s: float
    images_per_s: float
    efficiency: float      # vs the 1-device point (weak scaling)


def measure_train_step(n_devices: int, *, image_hw=(64, 64),
                       batch_per_device: int = 1,
                       basenet: str = 'shufflenetv2k16',
                       n_iters: int = 5) -> float:
    """Median step time of the sharded train step on ``n_devices``."""
    from .dryrun import build_tiny_model
    from ..training.optimize import OptimizeFactory
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import jax.numpy as jnp
    import optax

    devices = np.asarray(jax.devices()[:n_devices])
    mesh = Mesh(devices.reshape(n_devices, 1), ('data', 'spatial'))

    model, loss_fn = build_tiny_model(basenet)
    model.init(jax.random.key(0), input_hw=image_hw)
    opt_factory = OptimizeFactory()
    tx = opt_factory.optimizer(opt_factory.schedule(steps_per_epoch=10))

    params = model.variables['params']
    batch_stats = model.variables.get('batch_stats', {})
    opt_state = tx.init({'params': params})

    batch = n_devices * batch_per_device
    h, w = image_hw
    fh, fw = (h - 1) // 16 + 1, (w - 1) // 16 + 1
    rng = np.random.default_rng(0)
    images = rng.normal(size=(batch, h, w, 3)).astype(np.float32)

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

    targets = [target_for(m) for m in model.head_metas]

    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P('data'))
    images = jax.device_put(images, data_sh)
    targets = jax.tree.map(lambda x: jax.device_put(np.asarray(x), data_sh),
                           targets)
    params = jax.tree.map(lambda x: jax.device_put(x, repl), params)
    batch_stats = jax.tree.map(lambda x: jax.device_put(x, repl), batch_stats)
    opt_state = jax.tree.map(lambda x: jax.device_put(x, repl), opt_state)

    def train_step(params, batch_stats, opt_state, images, targets):
        def loss_of(p):
            variables = {'params': p}
            if batch_stats:
                variables['batch_stats'] = batch_stats
                fields, mutated = model.apply(variables, images, train=True,
                                              mutable=['batch_stats'])
                stats = mutated['batch_stats']
            else:
                fields = model.apply(variables, images, train=True)
                stats = batch_stats
            total, _ = loss_fn(fields, targets)
            return total, stats

        (total, stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        updates, new_opt = tx.update({'params': grads}, opt_state,
                                     {'params': params})
        new_params = optax.apply_updates({'params': params},
                                         updates)['params']
        return new_params, stats, new_opt, total

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    with mesh:
        out = step(params, batch_stats, opt_state, images, targets)
        jax.block_until_ready(out)
        params, batch_stats, opt_state = out[:3]

        times = []
        for _ in range(n_iters):
            t0 = time.perf_counter()
            out = step(params, batch_stats, opt_state, images, targets)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
            params, batch_stats, opt_state = out[:3]
    return float(np.median(times))


def sweep(device_counts, **kwargs) -> List[ScalingPoint]:
    points = []
    base_rate = None
    for n in device_counts:
        t = measure_train_step(n, **kwargs)
        batch = n * kwargs.get('batch_per_device', 1)
        rate = batch / t
        if base_rate is None:
            base_rate = rate / n  # per-device rate at the first point
        eff = rate / (base_rate * n)
        points.append(ScalingPoint(n, batch, t, rate, eff))
        LOG.info('devices=%d: %.1f ms/step, %.1f img/s, eff=%.0f%%',
                 n, t * 1000, rate, eff * 100)
    return points
