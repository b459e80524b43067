"""Training tests: loss decreases, resume works, multi-device dry run.

Mirrors reference ``tests/test_train.py`` (cifar10 smoke, SURVEY.md §4)
plus what the reference lacks: a fake-multi-device sharded-step test.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


def _run_cli(module, args, timeout=540):
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    return subprocess.run(
        [sys.executable, '-m', module] + args,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=timeout)


TRAIN_ARGS = ['--dataset=toykp', '--basenet=shufflenetv2k16',
              '--batch-size=4', '--toykp-n-images=8', '--toykp-image-size=81',
              '--no-bf16', '--log-interval=1']


def test_train_smoke_and_resume(tmp_path):
    out = str(tmp_path / 'model')
    result = _run_cli('openpifpaf_tpu.train',
                      TRAIN_ARGS + ['--epochs=1', '--output', out])
    assert result.returncode == 0, result.stderr
    assert os.path.exists(out + '.npz')
    assert os.path.exists(out + '.epoch001.npz')
    assert os.path.exists(out + '.train.npz')
    with open(out + '.log') as f:
        lines = [json.loads(l) for l in f]
    train_lines = [l for l in lines if l['type'] == 'train']
    assert train_lines and all(np.isfinite(l['loss']) for l in train_lines)
    assert any(l['type'] == 'val-epoch' for l in lines)

    # resume for one more epoch
    result = _run_cli('openpifpaf_tpu.train',
                      TRAIN_ARGS + ['--epochs=2', '--output', out, '--resume'])
    assert result.returncode == 0, result.stderr
    assert os.path.exists(out + '.epoch002.npz')
    with open(out + '.log') as f:
        lines = [json.loads(l) for l in f]
    epochs = [l['epoch'] for l in lines if l['type'] == 'train-epoch']
    assert epochs == [1, 2]


def test_loss_decreases_in_process():
    """A few steps on one batch must reduce the loss (in-process, fast)."""
    import jax

    from openpifpaf_tpu.parallel.dryrun import build_tiny_model
    from openpifpaf_tpu.training import OptimizeFactory, Trainer

    model, loss_fn = build_tiny_model()
    model.init(jax.random.key(0), input_hw=(81, 81))

    opt = OptimizeFactory()
    opt.lr = 1e-3
    opt.lr_warm_up_epochs = 0.01
    trainer = Trainer(model, loss_fn, opt, '/tmp/test_loss_decreases')
    state = trainer.init_state(steps_per_epoch=10)
    trainer._build_steps()  # pylint: disable=protected-access

    from openpifpaf_tpu import encoder
    from openpifpaf_tpu.plugins.toykp.datamodule import ToyKpDataset, ToyKp
    dm = ToyKp()
    for m in dm.head_metas:
        m.base_stride = 16
    ds = ToyKpDataset(8, 81, dm._preprocess(), seed=0)  # pylint: disable=protected-access
    from openpifpaf_tpu.datasets import collate_images_targets_meta
    images, targets, _ = collate_images_targets_meta([ds[i] for i in range(8)])
    images, targets = trainer._place(images, targets)  # pylint: disable=protected-access

    losses = []
    for _ in range(8):
        state, total, _ = trainer._train_step(state, images, targets)  # pylint: disable=protected-access
        losses.append(float(total))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.asarray(out.valid).shape[-1] > 0
