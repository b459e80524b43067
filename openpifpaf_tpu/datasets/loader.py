"""Lightweight data loader: map-style dataset -> batched numpy iterator.

Reference parity: the reference uses ``torch.utils.data.DataLoader`` with
worker processes (``datasets/factory.py:~60``).  TPU-first redesign: a
dependency-free loader that yields numpy batches; multi-process prefetch via
``multiprocessing`` with double-buffering.  Per-host sharding (the
DistributedSampler equivalent) is built in via ``shard()``.
"""

from __future__ import annotations

import itertools
import logging
import multiprocessing as mp
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

LOG = logging.getLogger(__name__)


class Dataset:
    """Map-style dataset protocol: __len__ + __getitem__."""

    def __len__(self) -> int:
        raise NotImplementedError

    def __getitem__(self, index: int):
        raise NotImplementedError


_WORKER_DATASET = None


def _worker_init(dataset):
    global _WORKER_DATASET  # pylint: disable=global-statement
    _WORKER_DATASET = dataset


def _worker_get(index: int):
    return _WORKER_DATASET[index]


class Loader:
    """Iterates a Dataset in batches.

    :param collate_fn: list of samples -> batch pytree (numpy leaves)
    :param drop_last: drop the trailing partial batch (keeps shapes static,
        which is what jit wants; default True for exactly that reason)
    """

    def __init__(self, dataset: Dataset, *, batch_size: int,
                 shuffle: bool = False,
                 collate_fn: Callable = None,
                 num_workers: int = 0,
                 drop_last: bool = True,
                 seed: int = 0,
                 prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn if collate_fn is not None else _default_collate
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.epoch = 0

        self._shard_id = 0
        self._n_shards = 1

    def shard(self, shard_id: int, n_shards: int) -> 'Loader':
        self._shard_id = shard_id
        self._n_shards = n_shards
        return self

    def _indices(self) -> Sequence[int]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        if self._n_shards > 1:
            # equalize shard sizes so every host runs the same #steps
            per_shard = n // self._n_shards
            order = order[self._shard_id * per_shard:(self._shard_id + 1) * per_shard]
        return order

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batched_indices(self):
        order = self._indices()
        for i in range(0, len(order), self.batch_size):
            batch = order[i:i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield batch

    def __iter__(self) -> Iterator:
        self.epoch += 1
        if self.num_workers <= 0:
            yield from self._iter_single()
        else:
            yield from self._iter_workers()

    def _iter_single(self):
        for batch_idx in self._batched_indices():
            yield self.collate_fn([self.dataset[int(i)] for i in batch_idx])

    def _iter_workers(self):
        with mp.Pool(self.num_workers, initializer=_worker_init,
                     initargs=(self.dataset,)) as pool:
            batches = list(self._batched_indices())
            flat = [int(i) for b in batches for i in b]
            batch_iter = pool.imap(_worker_get, flat,
                                   chunksize=max(1, self.batch_size // 2))
            out_q: 'queue.Queue' = queue.Queue(maxsize=self.prefetch)
            stop = object()

            def produce():
                try:
                    # group by the exact batch sizes so a trailing partial
                    # batch survives when drop_last=False
                    for b in batches:
                        samples = list(itertools.islice(batch_iter, len(b)))
                        if not samples:
                            break
                        out_q.put(self.collate_fn(samples))
                except Exception as e:  # pragma: no cover
                    out_q.put(e)
                finally:
                    out_q.put(stop)

            t = threading.Thread(target=produce, daemon=True)
            t.start()
            while True:
                item = out_q.get()
                if item is stop:
                    break
                if isinstance(item, Exception):  # pragma: no cover
                    raise item
                yield item
            t.join()


def _default_collate(samples):
    first = samples[0]
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (tuple, list)):
        return type(first)(_default_collate(list(s)) for s in zip(*samples))
    if isinstance(first, dict):
        return {k: _default_collate([s[k] for s in samples]) for k in first}
    return np.asarray(samples)


class ImageList(Dataset):
    """Dataset over image file paths with a preprocess transform.

    Reference: ``datasets`` ImageList used by the Predictor
    (``predictor.py:~100``).
    """

    def __init__(self, image_paths: Sequence[str], preprocess):
        self.image_paths = list(image_paths)
        self.preprocess = preprocess

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, index):
        from PIL import Image  # pylint: disable=import-outside-toplevel
        path = self.image_paths[index]
        with open(path, 'rb') as f:
            image = Image.open(f).convert('RGB')
        anns = []
        meta = {'dataset_index': index, 'file_name': path}
        image, anns, meta = self.preprocess(image, anns, meta)
        return image, anns, meta


class NumpyImageList(Dataset):
    """Dataset over in-memory numpy/PIL images (Predictor.numpy_images)."""

    def __init__(self, images, preprocess):
        self.images = list(images)
        self.preprocess = preprocess

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        from PIL import Image  # pylint: disable=import-outside-toplevel
        image = self.images[index]
        if isinstance(image, np.ndarray):
            image = Image.fromarray(np.asarray(image, dtype=np.uint8))
        anns = []
        meta = {'dataset_index': index}
        image, anns, meta = self.preprocess(image, anns, meta)
        return image, anns, meta
