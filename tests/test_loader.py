"""Loader unit tests (datasets/loader.py).

Reference parity role: the reference leans on torch DataLoader semantics
(``datasets/factory.py:~60``); these pin the same contract for the
dependency-free loader — batching, drop_last, worker prefetch parity,
per-host sharding.
"""

import numpy as np
import pytest

from openpifpaf_tpu.datasets.loader import Dataset, Loader


class Squares(Dataset):
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, index):
        return np.full((2,), index * index, np.int64)


def batches_of(loader):
    return [np.asarray(b) for b in loader]


def test_drop_last_true():
    loader = Loader(Squares(10), batch_size=4, drop_last=True)
    got = batches_of(loader)
    assert len(got) == len(loader) == 2
    assert all(b.shape == (4, 2) for b in got)


def test_drop_last_false_keeps_partial():
    loader = Loader(Squares(10), batch_size=4, drop_last=False)
    got = batches_of(loader)
    assert len(got) == len(loader) == 3
    assert got[-1].shape == (2, 2)
    np.testing.assert_array_equal(got[-1][:, 0], [64, 81])


@pytest.mark.parametrize('drop_last', [True, False])
def test_workers_match_single(drop_last):
    """Multi-process prefetch must yield exactly the single-process batches
    — including the trailing partial batch when drop_last=False."""
    kwargs = dict(batch_size=4, drop_last=drop_last, shuffle=True, seed=7)
    single = batches_of(Loader(Squares(11), **kwargs))
    workers = batches_of(Loader(Squares(11), num_workers=2, **kwargs))
    assert len(single) == len(workers)
    for s, w in zip(single, workers):
        np.testing.assert_array_equal(s, w)


def test_shuffle_changes_per_epoch_deterministically():
    loader = Loader(Squares(8), batch_size=8, shuffle=True, seed=3)
    first = batches_of(loader)[0]
    second = batches_of(loader)[0]
    assert not np.array_equal(first, second)

    loader2 = Loader(Squares(8), batch_size=8, shuffle=True, seed=3)
    np.testing.assert_array_equal(first, batches_of(loader2)[0])


def test_shard_equalizes_steps():
    full = Loader(Squares(10), batch_size=2)
    assert len(full) == 5
    shards = [Loader(Squares(10), batch_size=2).shard(i, 3) for i in range(3)]
    # every host runs the same number of steps (10 // 3 = 3 samples each)
    assert all(len(s) == 1 for s in shards)
    seen = np.concatenate([b[:, 0] for s in shards for b in batches_of(s)])
    assert len(set(seen.tolist())) == len(seen)
