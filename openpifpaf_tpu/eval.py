"""Eval CLI: run the predictor over a dataset's eval loader and score it.

Reference parity: ``src/openpifpaf/eval.py`` — ``Evaluator`` (``:~60``)
feeds Predictor output into the datamodule's metrics, accumulates, writes
``{checkpoint}.eval-{dataset}.stats.json`` with AP stats plus total/decoder
time accounting (``:~200``), and optionally the raw predictions
(``--write-predictions``).

Usage: ``python -m openpifpaf_tpu.eval --dataset=toykp --checkpoint=model.npz``
"""

from __future__ import annotations

import argparse
import itertools
import json
import logging
import os
import sys
import time

from . import datasets, decoder, logger, models
from .predictor import Predictor

LOG = logging.getLogger(__name__)


class Evaluator:
    def __init__(self, datamodule, predictor: Predictor):
        self.datamodule = datamodule
        self.predictor = predictor
        self.metrics = datamodule.metrics()
        self.n_images = 0

    loader_warmup = 0.0  # seconds to let loader workers fill their queue
                         # before timing starts (reference eval.py:~60)

    def run(self) -> dict:
        if self.predictor.multi_scale:
            return self.run_multi_scale()
        loader = self.datamodule.eval_loader()
        loader_iter = iter(loader)
        if self.loader_warmup:
            # Loader spawns workers/prefetch lazily on first next(): pull
            # the first batch now so the queue actually fills during the
            # sleep, and chain it back so nothing is skipped
            LOG.info('waiting %.1fs for loader warmup', self.loader_warmup)
            first = list(itertools.islice(loader_iter, 1))
            time.sleep(self.loader_warmup)
            loader_iter = itertools.chain(first, loader_iter)
        total_start = time.perf_counter()
        for pred, gt, image_meta in self.predictor.dataset_loader(loader_iter):
            for metric in self.metrics:
                metric.accumulate(pred, image_meta, ground_truth=gt)
            self.n_images += 1
        return self._stats(time.perf_counter() - total_start)

    def run_multi_scale(self) -> dict:
        """Eval-time multi-scale: one eval loader per (scale, hflip)
        variant, per-image OKS merge, metrics on the merged set.

        Reference: multi-scale eval via ``transforms/multi_scale.py:~10``;
        here each variant is its own static-shape compiled program (TPU:
        no dynamic shapes) and the merge reuses the Predictor machinery.
        """
        predictor = self.predictor
        base = (getattr(self.datamodule, 'eval_long_edge', None)
                or getattr(self.datamodule, 'image_size', None)
                or predictor.long_edge)
        variants, reference_index = predictor.multiscale_variants(base)
        LOG.info('multi-scale eval over %d variants: %s', len(variants),
                 variants)

        try:
            loaders = [self.datamodule.eval_loader(long_edge=le, hflip=hf)
                       for le, hf in variants]
        except TypeError as e:
            raise ValueError(
                f'{type(self.datamodule).__name__} does not support '
                'multi-scale eval (its eval_loader lacks the '
                'long_edge/hflip variant kwargs)') from e
        sigmas = getattr(predictor.model.head_metas[0], 'sigmas', None)

        loader_iters = [iter(loader) for loader in loaders]
        if self.loader_warmup:
            LOG.info('waiting %.1fs for loader warmup', self.loader_warmup)
            firsts = [list(itertools.islice(it, 1)) for it in loader_iters]
            time.sleep(self.loader_warmup)
            loader_iters = [itertools.chain(first, it)
                            for first, it in zip(firsts, loader_iters)]

        total_start = time.perf_counter()
        # zip per-variant iterators: results stream image by image, each
        # variant buffers at most one decoded batch
        iterators = [predictor.dataset_loader(it) for it in loader_iters]
        for results in zip(*iterators):
            ann_lists = [r[0] for r in results]
            _, gt, image_meta = results[reference_index]
            merged = predictor.merge_annotations(
                ann_lists, sigmas=sigmas, reference_index=reference_index)
            for metric in self.metrics:
                metric.accumulate(merged, image_meta, ground_truth=gt)
            self.n_images += 1
        return self._stats(time.perf_counter() - total_start)

    def _stats(self, total_time: float) -> dict:
        stats = {
            'n_images': self.n_images,
            'total_time': round(total_time, 3),
            'nn_time': round(self.predictor.total_nn_time, 3),
            'decoder_time': round(self.predictor.total_decoder_time, 3),
            'images_per_second': round(self.n_images / max(1e-6, total_time), 3),
        }
        all_values, all_labels = [], []
        for metric in self.metrics:
            metric_stats = metric.stats()
            all_values += list(metric_stats['stats'])
            all_labels += list(metric_stats['text_labels'])
        stats['stats'] = all_values
        stats['text_labels'] = all_labels
        return stats


def cli(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.eval',
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument('-o', '--output', default=None,
                        help='stats output file basename')
    parser.add_argument('--write-predictions', default=False,
                        action='store_true')
    parser.add_argument('--loader-warmup', default=Evaluator.loader_warmup,
                        type=float,
                        help='seconds to wait before timing starts')
    logger.cli(parser)
    models.Factory.cli(parser)
    decoder.cli(parser)
    Predictor.cli(parser)
    datasets.cli(parser)
    args = parser.parse_args(argv)

    logger.configure(args)
    models.Factory.configure(args)
    decoder.configure(args)
    Predictor.configure(args)
    datasets.configure(args)
    Evaluator.loader_warmup = args.loader_warmup
    return args


def main(argv=None) -> int:
    args = cli(argv)
    if Predictor.data_parallel:
        # multi-host eval rendezvous (same env contract as train --ddp)
        from .parallel import mesh as mesh_mod
        mesh_mod.initialize_distributed()
    datamodule = datasets.factory(args.dataset)
    predictor = Predictor(head_metas=datamodule.head_metas)

    evaluator = Evaluator(datamodule, predictor)
    stats = evaluator.run()

    # rank-0-only output (reference contract: src/openpifpaf/eval.py:~150;
    # every process computed identical stats from the all_gathered poses)
    import jax
    if jax.process_index() != 0:
        return 0

    if args.output is None:
        checkpoint = models.Factory.checkpoint or 'model'
        args.output = f'{checkpoint}.eval-{args.dataset}'
    os.makedirs(os.path.dirname(args.output) or '.', exist_ok=True)
    with open(args.output + '.stats.json', 'w') as f:
        json.dump(stats, f, indent=2)
    LOG.info('stats written to %s.stats.json', args.output)

    if args.write_predictions:
        for metric in evaluator.metrics:
            metric.write_predictions(args.output)

    if 'text_labels' in stats:
        for label, value in zip(stats['text_labels'], stats['stats']):
            print(f'{label:>8} = {value:.3f}')
    print(f'images/s = {stats["images_per_second"]:.2f}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
