"""Parallelism: device meshes, shardings, distributed init, spatial decode."""

from .mesh import (batch_only_sharding, batch_sharding, data_mesh,
                   initialize_distributed, replicate, replicated, shard_batch)
from .spatial import SpatialConfig, sharded_cif_hr, sharded_seeds

__all__ = ['batch_only_sharding', 'batch_sharding', 'data_mesh',
           'initialize_distributed', 'replicate', 'replicated', 'shard_batch',
           'SpatialConfig', 'sharded_cif_hr', 'sharded_seeds']
