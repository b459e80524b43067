"""Multi-dataset training: concatenate several datamodules.

Reference parity: ``src/openpifpaf/datasets/multimodule.py:~40`` — merges
head metas from all modules and round-robins their loaders.
"""

from __future__ import annotations

from typing import List, Sequence

from .module import DataModule


class MultiDataModule(DataModule):
    def __init__(self, datamodules: Sequence[DataModule]):
        self.datamodules = list(datamodules)
        self.head_metas = [m for dm in self.datamodules for m in dm.head_metas]

    def metrics(self) -> List:
        return [metric for dm in self.datamodules for metric in dm.metrics()]

    def _round_robin(self, loaders):
        iterators = [iter(l) for l in loaders]
        active = list(range(len(iterators)))
        while active:
            for i in list(active):
                try:
                    yield next(iterators[i])
                except StopIteration:
                    active.remove(i)

    def train_loader(self):
        loaders = [dm.train_loader() for dm in self.datamodules]
        n = sum(len(l) for l in loaders)

        class _Concat:
            def __len__(self_inner):
                return n

            def __iter__(self_inner):
                return self._round_robin(loaders)

        return _Concat()

    def val_loader(self):
        loaders = [dm.val_loader() for dm in self.datamodules]
        n = sum(len(l) for l in loaders)

        class _Concat:
            def __len__(self_inner):
                return n

            def __iter__(self_inner):
                return self._round_robin(loaders)

        return _Concat()

    def eval_loader(self):
        raise NotImplementedError('evaluate each datamodule separately')
