"""Multi-dataset training test (toykp + cifar10 through one model)."""

import jax
import jax.numpy as jnp
import numpy as np

from openpifpaf_tpu import datasets, losses, models


def test_multidataset_train_batches():
    dm = datasets.factory('toykp,cifar10')
    assert len(dm.head_metas) == 3  # cif, caf, cifdet

    from openpifpaf_tpu.plugins.cifar10.datamodule import Cifar10
    from openpifpaf_tpu.plugins.toykp.datamodule import ToyKp

    ToyKp.n_images = 4
    ToyKp.image_size = 81
    Cifar10.n_synthetic = 4
    old_batch_size = datasets.DataModule.batch_size
    datasets.DataModule.batch_size = 2

    try:
        model = models.Factory(base_name='shufflenetv2k16',
                               bf16=False).factory(
            head_metas=dm.head_metas, rng=jax.random.key(0))
        loss_fn = losses.Factory().factory(model.head_metas)

        seen_padding = set()
        for images, targets, _ in dm.train_loader():
            assert len(targets) == 3
            seen_padding.add(tuple(t is None for t in targets))
            outs = model(images)
            assert len(outs) == 3
            total, comps = loss_fn([jnp.asarray(o) for o in outs], targets)
            assert np.isfinite(float(total))
            assert len(comps) == 9
            # padded heads contribute exactly zero
            for t, head_comps in zip(targets, [comps[0:3], comps[3:6],
                                               comps[6:9]]):
                if t is None:
                    assert all(float(c) == 0.0 for c in head_comps)

        # both datamodules' batches appeared, each with its padding pattern
        assert (False, False, True) in seen_padding   # toykp: cif+caf
        assert (True, True, False) in seen_padding    # cifar10: cifdet
    finally:
        datasets.DataModule.batch_size = old_batch_size
