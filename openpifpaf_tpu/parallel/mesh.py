"""Device mesh and sharding helpers — the distributed backbone.

Reference parity: the reference's only parallelism is data parallelism via
``torch.nn.DataParallel`` / DDP over NCCL (``train.py:~160``,
SURVEY.md §2.9).  TPU-native redesign: one global ``jax.sharding.Mesh``
over every chip of every host; batches are sharded over the ``data`` axis
(per-host input pipelines feed their local shard), parameters are
replicated, and XLA inserts the gradient ``psum`` over ICI/DCN
automatically from the sharding annotations.  An optional ``spatial`` axis
shards image rows for very large inputs (XLA handles conv halo exchange).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOG = logging.getLogger(__name__)


def initialize_distributed() -> None:
    """Multi-host initialization (reference: init_process_group, env://).

    Uses jax.distributed with the standard env variables
    (``JAX_COORDINATOR``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``) or cloud
    auto-detection.  No-op when the variables are absent or when already
    initialized.

    NOTE: must run before anything touches a JAX backend — even
    ``jax.process_count()`` initializes the local client, after which
    ``jax.distributed.initialize`` raises.  Exercised for real by
    ``tests/test_multiprocess.py`` (2 CPU processes over a localhost
    coordinator).
    """
    coordinator = os.environ.get('JAX_COORDINATOR')
    if not coordinator:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']))
    except RuntimeError as exc:
        if 'already initialized' not in str(exc).lower():
            # a real rendezvous/init failure: continuing would silently
            # train N independent single-process copies on split data
            raise
        LOG.warning('jax.distributed.initialize: %s', exc)
    LOG.info('distributed: process %d/%d', jax.process_index(),
             jax.process_count())


def data_mesh(n_devices: Optional[int] = None,
              spatial: int = 1) -> Mesh:
    """Global mesh with a ``data`` axis (and optional ``spatial`` axis)."""
    devices = np.asarray(jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = devices.size
    assert n % spatial == 0, (n, spatial)
    return Mesh(devices.reshape(n // spatial, spatial), ('data', 'spatial'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image batches: batch over data, rows over spatial."""
    return NamedSharding(mesh, P('data', 'spatial'))


def batch_only_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host-local batch pytree onto the global mesh's data axis.

    With multiple hosts every process passes its local shard; the global
    array is assembled across processes
    (``jax.make_array_from_process_local_data``).
    """
    sharding = batch_only_sharding(mesh)

    def place(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
