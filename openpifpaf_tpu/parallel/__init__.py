"""Parallelism: device meshes, shardings, distributed init."""

from .mesh import (batch_only_sharding, batch_sharding, data_mesh,
                   initialize_distributed, replicate, replicated, shard_batch)

__all__ = ['batch_only_sharding', 'batch_sharding', 'data_mesh',
           'initialize_distributed', 'replicate', 'replicated', 'shard_batch']
