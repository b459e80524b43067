"""Guide 5 — Device meshes: data-parallel training and spatial decode.

The reference scales with DDP gradient all-reduce (``train.py:~160``).
Here scaling is sharding: one global ``jax.sharding.Mesh``, batches shard
over a ``data`` axis, parameters replicate, and XLA inserts the gradient
``psum`` collectives from the sharding annotations alone.  A second
``spatial`` axis can shard very large images by rows — both for the conv
forward (XLA inserts halo exchanges) and for the decoder front-end
(explicit ``ppermute`` halo composition, ``parallel/spatial.py``).

This runs on ANY device count — including a virtual CPU mesh, which is how
CI tests multi-chip semantics without TPUs.

Run: ``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python guide/05_sharding.py``
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from openpifpaf_tpu import parallel
from openpifpaf_tpu.ops import cif_hr

n = min(8, len(jax.devices()))
print('devices:', n)

# --- data-parallel batch sharding ------------------------------------------
mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n, 1), ('data', 'spatial'))
batch = {'x': np.arange(2 * n * 3, dtype=np.float32).reshape(2 * n, 3)}
placed = parallel.shard_batch(mesh, batch)
print('batch sharding:', placed['x'].sharding.spec)

params = jax.device_put(np.ones(3, np.float32), NamedSharding(mesh, P()))


@jax.jit
def grad_step(params, batch):
    # the mean over the sharded batch axis becomes a psum across devices —
    # no collective is written by hand
    loss_fn = lambda p: jnp.mean((batch['x'] @ p) ** 2)
    return jax.grad(loss_fn)(params)


grads = grad_step(params, placed)
print('grads (replicated):', np.asarray(grads).round(1))

# --- spatially-sharded decode front-end -------------------------------------
spatial_mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ('spatial',))
rng = np.random.default_rng(0)
f, h, w, stride = 17, 32, 24, 8
conf = rng.uniform(0, 1, (f, h, w)).astype(np.float32)
jj, ii = np.mgrid[0:h, 0:w].astype(np.float32)
x_px = ((ii[None] + rng.uniform(-1, 1, (f, h, w))) * stride).astype(np.float32)
y_px = ((jj[None] + rng.uniform(-1, 1, (f, h, w))) * stride).astype(np.float32)
scale_px = rng.uniform(2.0, 8.0, (f, h, w)).astype(np.float32)
config = cif_hr.CifHrConfig()
out_hw = (h * stride // config.spacing, w * stride // config.spacing)

sharded = parallel.sharded_cif_hr(
    jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
    jnp.asarray(scale_px), mesh=spatial_mesh, out_hw=out_hw, config=config,
    spatial=parallel.SpatialConfig(halo_px=24.0))
oracle = cif_hr.accumulate(
    jnp.asarray(conf), jnp.asarray(x_px), jnp.asarray(y_px),
    jnp.asarray(scale_px), out_hw=out_hw, config=config)
print('spatial cifhr bands:', n, 'halo overflow:',
      int(sharded.halo_overflow), 'max|diff| vs single-device:',
      float(jnp.max(jnp.abs(sharded.hr - oracle))))
assert int(sharded.halo_overflow) == 0
assert float(jnp.max(jnp.abs(sharded.hr - oracle))) < 1e-5
print('guide 05 OK')
