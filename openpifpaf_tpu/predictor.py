"""Predictor: high-level batched inference API.

Reference parity: ``src/openpifpaf/predictor.py:~60`` —
``Predictor.images()/numpy_images()/dataset()`` load a checkpoint, build the
matching decoder, batch images through preprocess -> forward -> decode and
inverse-map annotations back to original image coordinates (``:~140``).

TPU-first: the preprocess pads every image to one static size
(``--long-edge`` square) so a single compiled forward+decode program serves
the whole stream; forward runs jitted in bfloat16 with the decode chained
on-device.
"""

from __future__ import annotations

import argparse
import logging
import time
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from . import datasets, decoder as decoder_mod, models, transforms

LOG = logging.getLogger(__name__)


class Predictor:
    batch_size = 1
    long_edge = 641
    loader_workers: Optional[int] = None
    # multi-scale prediction: decode at several long edges (and their
    # hflips) and merge with OKS suppression; one compiled program per
    # (scale, hflip) variant — static shapes (reference: --multi-scale eval,
    # transforms/multi_scale.py:~10)
    multi_scale = False
    multi_scale_hflip = True
    multi_scale_factors = (0.75, 1.0, 1.25)
    # shard eval batches over all devices of a `data` mesh (reference has no
    # multi-GPU inference; TPU-native eval scales like training does —
    # forward AND on-device decode partition along the batch axis)
    data_parallel = False

    def __init__(self, *, checkpoint: Optional[str] = None,
                 model: Optional[models.Model] = None,
                 head_metas=None,
                 json_data: bool = False):
        if model is None:
            factory = models.Factory()
            if checkpoint is not None:
                factory.checkpoint = checkpoint
            model = factory.factory(head_metas=head_metas)
        self.model = model
        self.decoder = decoder_mod.factory(model.head_metas)
        self.json_data = json_data
        self.last_decoder_time = 0.0
        self.last_nn_time = 0.0
        self.total_nn_time = 0.0
        self.total_decoder_time = 0.0
        self.total_images = 0

        self._mesh = None
        self._multiprocess = False
        self._gather = None
        if self.data_parallel and jax.device_count() > 1:
            from .parallel import mesh as mesh_mod

            self._mesh = mesh_mod.data_mesh()
            self.model.variables = mesh_mod.replicate(self._mesh,
                                                      self.model.variables)
            n = self._mesh.shape['data']
            self._multiprocess = jax.process_count() > 1
            if self._multiprocess:
                # multi-host eval (SURVEY §7): every process feeds its
                # slice of the global batch, forward+decode run sharded
                # over the global data axis, and the static-shaped decoded
                # pose tensors are all_gathered (one jitted identity with
                # replicated out-shardings -> XLA all_gather over ICI)
                # before the host transfer, so every process can extract
                # annotations; rank 0 runs the metric (reference contract:
                # rank-0-only eval, src/openpifpaf/eval.py:~150).
                if not hasattr(self.decoder, 'batch_decoded'):
                    LOG.warning(
                        '%s has no batch_decoded tensor path; multi-process '
                        '--dp-eval disabled', type(self.decoder).__name__)
                    self._mesh = None
                    self._multiprocess = False
                else:
                    from jax.sharding import NamedSharding, PartitionSpec

                    rep = NamedSharding(self._mesh, PartitionSpec())
                    self._gather = jax.jit(lambda t: t, out_shardings=rep)
                    LOG.info(
                        'multi-process data-parallel eval: %d processes, '
                        '%d devices', jax.process_count(), n)
            else:
                LOG.info('data-parallel eval over %d devices', n)
            if self._mesh is not None and self.batch_size < n:
                LOG.warning(
                    'batch size %d < %d devices: batches are padded with '
                    'copies and the extra decodes discarded — set '
                    '--predictor-batch-size >= %d for actual speedup',
                    self.batch_size, n, n)

        self._forward = jax.jit(
            lambda variables, x: model.apply_fast(variables, x))

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('Predictor')
        group.add_argument('--long-edge', default=cls.long_edge, type=int,
                           help='rescale the long side and pad to this size')
        group.add_argument('--predictor-batch-size', dest='predictor_batch_size',
                           default=cls.batch_size, type=int,
                           help='prediction batch size')
        group.add_argument('--dp-eval', dest='predictor_data_parallel',
                           default=cls.data_parallel, action='store_true',
                           help='shard prediction batches over all devices')
        group.add_argument('--multi-scale', dest='predictor_multi_scale',
                           default=cls.multi_scale, action='store_true',
                           help='predict at multiple scales and merge')
        group.add_argument('--no-multi-scale-hflip',
                           dest='predictor_multi_scale_hflip',
                           default=cls.multi_scale_hflip, action='store_false',
                           help='skip the hflipped variants in --multi-scale')
        group.add_argument('--multi-scale-factors', nargs='+', type=float,
                           dest='predictor_multi_scale_factors',
                           default=list(cls.multi_scale_factors),
                           help='long-edge factors for --multi-scale')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.long_edge = args.long_edge
        cls.batch_size = args.predictor_batch_size
        cls.data_parallel = args.predictor_data_parallel
        cls.multi_scale = args.predictor_multi_scale
        cls.multi_scale_hflip = args.predictor_multi_scale_hflip
        cls.multi_scale_factors = tuple(args.predictor_multi_scale_factors)

    def _place_batch(self, images: np.ndarray):
        """Pad the batch to the device count and shard it over the mesh.

        Multi-process: every process sees the same global batch (the eval
        loader is deterministic and iterated identically everywhere) and
        contributes its contiguous slice —
        ``jax.make_array_from_process_local_data`` assembles the global
        array over the mesh's data axis."""
        if self._mesh is None:
            return jax.device_put(images), images.shape[0]
        n_total = self._mesh.shape['data']
        b = images.shape[0]
        pad = (-b) % n_total
        if pad:
            images = np.concatenate(
                [images, np.repeat(images[-1:], pad, axis=0)], axis=0)
        if self._multiprocess:
            per = images.shape[0] // jax.process_count()
            lo = jax.process_index() * per
            images = images[lo:lo + per]
        from .parallel import mesh as mesh_mod
        placed = mesh_mod.shard_batch(self._mesh, images)
        return placed, b

    # ------------------------------------------------------------------
    def preprocess_factory(self, *, long_edge: Optional[int] = None,
                           hflip: bool = False) -> transforms.Preprocess:
        long_edge = long_edge or self.long_edge
        keypoints = getattr(self.model.head_metas[0], 'keypoints', []) or []
        steps = [
            transforms.NormalizeAnnotations(
                keypoints=keypoints,
                skeleton=getattr(self.model.head_metas[0], 'draw_skeleton', [])
                or []),
        ]
        if hflip:
            from .transforms.hflip import hflip_map_from_keypoints
            steps.append(transforms.HFlip(
                keypoints, hflip_map_from_keypoints(keypoints)))
        steps += [
            transforms.RescaleAbsolute(long_edge),
            transforms.CenterPad(long_edge),
            transforms.EVAL_TRANSFORM,
        ]
        return transforms.Compose(steps)

    def dataset(self, data, *,
                json_data: Optional[bool] = None) -> Iterator[Tuple[List, List, dict]]:
        """Iterate (pred, gt_anns, meta) over a Dataset/Loader."""
        if isinstance(data, datasets.Loader):
            loader = data
        else:
            workers = self.loader_workers or 0
            loader = datasets.Loader(
                data, batch_size=self.batch_size, shuffle=False,
                collate_fn=datasets.collate_images_anns_meta,
                num_workers=workers, drop_last=False)
        yield from self.dataset_loader(loader, json_data=json_data)

    def dataset_loader(self, loader, *,
                       json_data: Optional[bool] = None
                       ) -> Iterator[Tuple[List, List, dict]]:
        if json_data is None:
            json_data = self.json_data
        for images, gt_batch, meta_batch in loader:
            start = time.perf_counter()
            images, _ = self._place_batch(np.asarray(images))
            fields = self._forward(self.model.variables, images)
            self.last_nn_time = time.perf_counter() - start
            self.total_nn_time += self.last_nn_time

            start = time.perf_counter()
            if self._multiprocess:
                # sharded decode -> all_gather pose tensors -> host
                decoded = self.decoder.batch_decoded(fields)
                decoded = self._gather(decoded)
                decoded_np = jax.tree.map(np.asarray, decoded)
                pred_batch = self.decoder.annotations_from_decoded(
                    decoded_np, len(meta_batch))
            elif decoder_mod.Decoder.profile:
                from .profiler import Profiler  # pylint: disable=import-outside-toplevel

                with Profiler(out_name=decoder_mod.Decoder.profile)():
                    pred_batch = self.decoder.batch_fields(
                        fields, metas=meta_batch)
            else:
                pred_batch = self.decoder.batch_fields(fields,
                                                       metas=meta_batch)
            self.last_decoder_time = time.perf_counter() - start
            self.total_decoder_time += self.last_decoder_time
            self.total_images += len(meta_batch)

            for preds, gts, meta in zip(pred_batch, gt_batch, meta_batch):
                preds = [ann.inverse_transform(meta) for ann in preds]
                gts = [ann.inverse_transform(meta) for ann in gts]
                if json_data:
                    preds = [ann.json_data() for ann in preds]
                yield preds, gts, meta

    def images(self, paths: Sequence[str]) -> Iterator:
        if self.multi_scale:
            yield from self.images_multiscale(paths)
            return
        data = datasets.ImageList(paths, self.preprocess_factory())
        yield from self.dataset(data)

    # -- multi-scale ----------------------------------------------------
    @staticmethod
    def merge_annotations(annotation_lists, *, sigmas=None,
                          oks_threshold: float = 0.7,
                          reference_index: int = 0):
        """Merge per-scale annotation sets (already in original image
        coordinates): greedy score-ordered OKS suppression.

        Reference parity: multi-scale eval
        (``transforms/multi_scale.py:~10``) merges the per-scale decodes.
        """
        from .decoder.pose_similarity import oks_matrix

        # OKS merging is keypoint-only; box-only annotations (AnnotationDet)
        # pass through from the reference variant unmerged
        passthrough = [a for a in (annotation_lists[reference_index]
                                   if annotation_lists else [])
                       if getattr(a, 'data', None) is None]
        annotation_lists = [[a for a in anns
                             if getattr(a, 'data', None) is not None]
                            for anns in annotation_lists]

        merged = []
        candidates = sorted((a for anns in annotation_lists for a in anns),
                            key=lambda a: -a.score)
        for ann in candidates:
            if sigmas is None:
                sig = np.full(ann.data.shape[0], 0.05, np.float32)
            else:
                sig = np.asarray(sigmas, np.float32)
            if any(oks_matrix(kept.data[None], ann.data[None], sig)[0, 0]
                   > oks_threshold for kept in merged):
                continue
            merged.append(ann)
        return merged + passthrough

    def multiscale_variants(self, base_long_edge: Optional[int] = None):
        """(variant (long_edge, hflip) keys, reference variant index).

        Long edges are rounded to the stride grid (reference eval
        resolution 641 = 40*16+1); each size is its own compiled program.
        The reference variant — meta/gt/box passthrough come from it — is
        the largest non-flipped scale.  Shared by ``images_multiscale``
        and eval's ``run_multi_scale`` so predict and eval always use the
        same scales.
        """
        base = base_long_edge or self.long_edge
        long_edges = sorted({
            max(2, int(round(base * f / 16))) * 16 + 1
            for f in self.multi_scale_factors})
        hflips = (False, True) if self.multi_scale_hflip else (False,)
        variant_keys = [(long_edge, hflip) for long_edge in long_edges
                        for hflip in hflips]
        return variant_keys, variant_keys.index((max(long_edges), False))

    def images_multiscale(self, paths: Sequence[str],
                          long_edges: Optional[Sequence[int]] = None) -> Iterator:
        """Predict each image at several scales (and hflips) and merge.

        Yields ``(merged_predictions, gt, meta_of_reference_scale)`` per
        image.  One compiled forward+decode program per (scale, hflip)
        variant (static shapes); predictions are inverse-transformed to
        original image coordinates before the OKS merge, so variants
        compose exactly.
        """
        if long_edges is not None:
            hflips = (False, True) if self.multi_scale_hflip else (False,)
            variant_keys = [(le, hf) for le in sorted(long_edges)
                            for hf in hflips]
            reference_index = variant_keys.index((max(long_edges), False))
        else:
            variant_keys, reference_index = self.multiscale_variants()

        meta0 = self.model.head_metas[0]
        sigmas = getattr(meta0, 'sigmas', None)
        json_data = self.json_data   # read once; do not mutate shared state

        # zip the per-variant iterators so results stream image by image
        # (each iterator buffers at most one decoded batch) instead of
        # materializing all variants for the whole path list.  The
        # per-variant runs yield Annotation objects for the OKS merge
        # (json_data=False); conversion happens after merging.
        iterators = [
            iter(self.dataset(datasets.ImageList(
                paths, self.preprocess_factory(long_edge=long_edge,
                                               hflip=hflip)),
                json_data=False))
            for long_edge, hflip in variant_keys]
        for results in zip(*iterators):
            # dataset() already inverse-transforms predictions to the
            # original image coordinates, so variants compose exactly
            ann_lists = [r[0] for r in results]
            _, gt, meta = results[reference_index]
            merged = self.merge_annotations(
                ann_lists, sigmas=sigmas,
                reference_index=reference_index)
            if json_data:
                merged = [ann.json_data() for ann in merged]
            yield merged, gt, meta

    def numpy_images(self, images) -> Iterator:
        data = datasets.NumpyImageList(images, self.preprocess_factory())
        yield from self.dataset(data)

    def image(self, path: str):
        return next(iter(self.images([path])))

    def numpy_image(self, image):
        return next(iter(self.numpy_images([image])))
