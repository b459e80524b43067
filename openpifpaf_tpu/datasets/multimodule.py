"""Multi-dataset training: concatenate several datamodules.

Reference parity: ``src/openpifpaf/datasets/multimodule.py:~40`` — merges
head metas from all modules and round-robins their loaders.  Each batch
carries targets only for its source datamodule's heads; the other heads'
target slots are padded with ``None`` and contribute zero loss
(``losses/multi_head.py``) — the model still computes every head (one
compiled program per batch shape), matching the reference's multi-dataset
strategy.
"""

from __future__ import annotations

from typing import List, Sequence

from .module import DataModule


class MultiDataModule(DataModule):
    def __init__(self, datamodules: Sequence[DataModule]):
        self.datamodules = list(datamodules)
        self.head_metas = [m for dm in self.datamodules for m in dm.head_metas]
        # head offsets per datamodule into the merged head list
        self._offsets = []
        offset = 0
        for dm in self.datamodules:
            self._offsets.append(offset)
            offset += len(dm.head_metas)
        self._n_heads = offset

    def metrics(self) -> List:
        return [metric for dm in self.datamodules for metric in dm.metrics()]

    def _pad_targets(self, module_i: int, targets):
        """Align one datamodule's target tuple with the merged head list."""
        padded = [None] * self._n_heads
        offset = self._offsets[module_i]
        for i, t in enumerate(targets):
            padded[offset + i] = t
        return tuple(padded)

    def _round_robin(self, loaders):
        iterators = [iter(l) for l in loaders]
        active = list(range(len(iterators)))
        while active:
            for i in list(active):
                try:
                    images, targets, metas = next(iterators[i])
                except StopIteration:
                    active.remove(i)
                    continue
                yield images, self._pad_targets(i, targets), metas

    def _concat(self, loaders):
        n = sum(len(l) for l in loaders)
        outer = self

        class _Concat:
            def __len__(self):
                return n

            def __iter__(self):
                return outer._round_robin(loaders)

        return _Concat()

    def train_loader(self):
        return self._concat([dm.train_loader() for dm in self.datamodules])

    def val_loader(self):
        return self._concat([dm.val_loader() for dm in self.datamodules])

    def eval_loader(self):
        raise NotImplementedError('evaluate each datamodule separately')
