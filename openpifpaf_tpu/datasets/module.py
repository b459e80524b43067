"""DataModule: the per-dataset contract.

Reference parity: ``src/openpifpaf/datasets/module.py:~15`` — a DataModule
declares its ``head_metas`` and provides train/val/eval loaders plus
metrics.  Class-level configuration (batch size, workers) follows the
reference's ``cli``/``configure`` pattern via ``datasets/factory.py:~30``.

TPU-first notes: loaders yield **numpy** batches with static shapes
(image tensors NHWC); device placement and sharding happen in the trainer /
predictor, per-host in multi-host mode.
"""

from __future__ import annotations

from typing import List

from .. import headmeta


class DataModule:
    """Base class for datasets."""

    # class-level configuration, set by datasets.factory cli/configure
    batch_size = 8
    loader_workers = 0

    # instance attribute set by subclasses
    head_metas: List[headmeta.Base] = None

    @classmethod
    def cli(cls, parser):
        """Add dataset-specific CLI options."""

    @classmethod
    def configure(cls, args):
        """Apply parsed CLI options to class attributes."""

    def metrics(self):
        """List of metric.Base instances for evaluation."""
        raise NotImplementedError

    def train_loader(self):
        raise NotImplementedError

    def val_loader(self):
        raise NotImplementedError

    def eval_loader(self, *, long_edge=None, hflip=False):
        """Eval loader; ``long_edge``/``hflip`` override the eval rescale
        size and mirror the images (multi-scale eval: the Evaluator builds
        one loader per (scale, hflip) variant and OKS-merges the decodes —
        reference ``src/openpifpaf/transforms/multi_scale.py:~10``).
        Datamodules that don't support variants may ignore the kwargs
        only if they raise when given non-default values."""
        raise NotImplementedError

    def distributed_sampler(self, loader, *, host_id: int, n_hosts: int):
        """Restrict a loader to this host's shard (multi-host data parallel).

        Reference: DistributedSampler usage in ``datasets/factory.py:~90``.
        """
        loader.shard(host_id, n_hosts)
        return loader
