"""Train CLI.

Reference parity: ``src/openpifpaf/train.py`` — argparse assembly over all
subsystem ``cli()`` hooks (``:~60``), datamodule + model + loss
construction, distributed init (the reference's DDP path, ``:~160``) and
``Trainer.loop``.

Usage::

    python -m openpifpaf_tpu.train --dataset=toykp --basenet=shufflenetv2k16 \
        --epochs=1 --batch-size=8 --output out/model
"""

from __future__ import annotations

import argparse
import logging
import sys

import jax

from . import datasets, logger, losses, models, encoder, visualizer
from .parallel import mesh as mesh_mod
from .training import OptimizeFactory, Trainer

LOG = logging.getLogger(__name__)


def default_output_file(args) -> str:
    base = args.basenet or 'model'
    return f'outputs/{base}-{args.dataset}'


def cli(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.train',
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('-o', '--output', default=None,
                        help='output file basename')
    parser.add_argument('--resume', default=False, action='store_true',
                        help='resume from output .train.npz checkpoint')
    parser.add_argument('--seed', default=0, type=int)
    parser.add_argument('--ddp', default=False, action='store_true',
                        help='multi-host training (jax.distributed)')
    logger.cli(parser)
    models.Factory.cli(parser)
    losses.Factory.cli(parser)
    encoder.cli(parser)
    OptimizeFactory.cli(parser)
    Trainer.cli(parser)
    datasets.cli(parser)
    visualizer.cli(parser)
    args = parser.parse_args(argv)

    logger.configure(args)
    models.Factory.configure(args)
    losses.Factory.configure(args)
    encoder.configure(args)
    OptimizeFactory.configure(args)
    Trainer.configure(args)
    datasets.configure(args)
    visualizer.configure(args)
    if args.output is None:
        args.output = default_output_file(args)
    return args


def main(argv=None) -> int:
    args = cli(argv)
    if args.ddp:
        mesh_mod.initialize_distributed()
    LOG.info('devices: %d (%d processes)', jax.device_count(),
             jax.process_count())

    import os
    os.makedirs(os.path.dirname(args.output) or '.', exist_ok=True)

    datamodule = datasets.factory(args.dataset)
    model_factory = models.Factory()
    model = model_factory.factory(head_metas=datamodule.head_metas,
                                  rng=jax.random.key(args.seed))
    LOG.info('model: %s, %d params', model.basenet_name, model.num_params())

    loss_factory = losses.Factory()
    loss_fn = loss_factory.factory(model.head_metas)

    trainer = Trainer(model, loss_fn, OptimizeFactory(), args.output)
    trainer.auto_tune_mtl = loss_factory.auto_tune_mtl

    train_loader = datamodule.train_loader()
    val_loader = datamodule.val_loader()
    if jax.process_count() > 1:
        train_loader = datamodule.distributed_sampler(
            train_loader, host_id=jax.process_index(),
            n_hosts=jax.process_count())
        val_loader = datamodule.distributed_sampler(
            val_loader, host_id=jax.process_index(),
            n_hosts=jax.process_count())
    LOG.info('%d training batches, %d validation batches',
             len(train_loader), len(val_loader))

    state = None
    start_epoch = model.epoch
    if args.resume:
        state, start_epoch = trainer.load_train_checkpoint(
            args.output + '.train.npz', len(train_loader))
        LOG.info('resumed from epoch %d', start_epoch)

    trainer.loop(train_loader, val_loader, start_epoch=start_epoch,
                 state=state)
    return 0


if __name__ == '__main__':
    sys.exit(main())
