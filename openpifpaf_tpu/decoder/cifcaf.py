"""CifCaf decoder wrapper: jitted pipeline -> Annotation objects.

Reference parity: ``src/openpifpaf/decoder/cifcaf.py:~40`` — owns the
per-(cif, caf) head decode, exposes all thresholds as CLI flags
(``--seed-threshold``, ``--keypoint-threshold``, ``--force-complete-pose``,
``--dense-connections``, ...) and converts pose tensors into ``Annotation``
objects (``:~120``).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from typing import List, Tuple

import numpy as np

from .decoder import Decoder
from .. import headmeta
from ..annotation import Annotation
from ..ops import CifCafConfig, make_batch_decoder
from ..ops import caf_scored, cif_hr, growth, nms, seeds

LOG = logging.getLogger(__name__)


class CifCaf(Decoder):
    # class-level configuration (reference static thresholds)
    seed_threshold = 0.2
    keypoint_threshold = 0.15
    keypoint_threshold_rel = 0.5
    instance_threshold = 0.15
    caf_score_th = 0.2
    cif_hr_v_threshold = 0.1
    force_complete = False
    force_complete_caf_th = 0.001  # relaxed CAF threshold in that mode
    reverse_match = True
    connection_blend = True
    dense_connections = 0.0
    max_poses = 96
    max_seeds = 512
    max_caf_candidates = 256
    cif_hr_max_active = 1024   # CifHr compaction budget (0 = dense)
    nms_before_force_complete = False
    hr_spacing = 2

    def __init__(self, cif_meta: headmeta.Cif, caf_meta: headmeta.Caf,
                 dense_caf_meta: headmeta.Caf = None):
        self.cif_meta = cif_meta
        self.base_caf_meta = caf_meta
        self.dense_caf_meta = dense_caf_meta
        if dense_caf_meta is not None and self.dense_connections:
            # decode over the concatenated sparse+dense skeleton with the
            # dense edges' confidence scaled (reference --dense-connections)
            dense = dataclasses.replace(dense_caf_meta) \
                if dataclasses.is_dataclass(dense_caf_meta) else dense_caf_meta
            dense.decoder_confidence_scales = \
                [self.dense_connections] * len(dense.skeleton)
            self.caf_meta = headmeta.Caf.concatenate([caf_meta, dense])
        else:
            self.caf_meta = caf_meta
        self._decoders = {}  # image_hw -> jitted batched decode

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('CifCaf decoder')
        group.add_argument('--seed-threshold', default=cls.seed_threshold,
                           type=float, help='minimum seed value')
        group.add_argument('--keypoint-threshold',
                           default=cls.keypoint_threshold, type=float,
                           help='minimum grown keypoint score')
        group.add_argument('--keypoint-threshold-rel',
                           default=cls.keypoint_threshold_rel, type=float,
                           help='min keypoint score relative to source joint')
        group.add_argument('--instance-threshold',
                           default=cls.instance_threshold, type=float,
                           help='minimum pose score')
        group.add_argument('--caf-score-th', default=cls.caf_score_th,
                           type=float, help='CAF candidate threshold')
        group.add_argument('--force-complete-pose', dest='force_complete',
                           default=cls.force_complete, action='store_true',
                           help='relaxed second growth pass to fill poses')
        group.add_argument('--force-complete-caf-th',
                           default=cls.force_complete_caf_th, type=float,
                           help='CAF candidate threshold used with '
                                '--force-complete-pose')
        group.add_argument('--no-reverse-match', dest='reverse_match',
                           default=cls.reverse_match, action='store_false',
                           help='disable reverse-match confirmation')
        group.add_argument('--connection-method',
                           default='blend' if cls.connection_blend else 'max',
                           choices=('blend', 'max'),
                           help='association candidate combination')
        group.add_argument('--dense-connections', nargs='?',
                           type=float, default=cls.dense_connections,
                           const=1.0,
                           help='use dense skeleton connections at this '
                                'confidence scale')
        group.add_argument('--decoder-max-poses', default=cls.max_poses,
                           type=int, help='static pose budget per image')
        group.add_argument('--decoder-max-seeds', default=cls.max_seeds,
                           type=int, help='static seed budget per image')
        group.add_argument('--cifhr-max-active', default=cls.cif_hr_max_active,
                           type=int,
                           help='CifHr active-cell compaction budget per '
                                'field (0 = exact dense splat)')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.seed_threshold = args.seed_threshold
        cls.keypoint_threshold = args.keypoint_threshold
        cls.keypoint_threshold_rel = args.keypoint_threshold_rel
        cls.instance_threshold = args.instance_threshold
        cls.caf_score_th = args.caf_score_th
        cls.force_complete = args.force_complete
        cls.force_complete_caf_th = args.force_complete_caf_th
        cls.reverse_match = args.reverse_match
        cls.connection_blend = args.connection_method == 'blend'
        cls.dense_connections = args.dense_connections
        cls.max_poses = args.decoder_max_poses
        cls.max_seeds = args.decoder_max_seeds
        cls.cif_hr_max_active = args.cifhr_max_active

    @classmethod
    def match(cls, head_metas) -> bool:
        return (len(head_metas) >= 2
                and isinstance(head_metas[0], headmeta.Cif)
                and isinstance(head_metas[1], headmeta.Caf))

    @classmethod
    def factory(cls, head_metas) -> List['CifCaf']:
        if not cls.match(head_metas):
            return []
        dense = None
        if (len(head_metas) >= 3 and isinstance(head_metas[2], headmeta.Caf)
                and not isinstance(head_metas[2], headmeta.Tcaf)):
            dense = head_metas[2]
        return [cls(head_metas[0], head_metas[1], dense_caf_meta=dense)]

    def _caf_field(self, fields, axis: int):
        # stays on device: host-side asarray would both add a round-trip
        # and break on multi-process global arrays (--dp-eval)
        base = fields[self.base_caf_meta.head_index]
        if self.dense_caf_meta is None or not self.dense_connections:
            return base
        import jax.numpy as jnp
        dense = fields[self.dense_caf_meta.head_index]
        return jnp.concatenate([jnp.asarray(base), jnp.asarray(dense)],
                               axis=axis)

    # ------------------------------------------------------------------
    def config_for(self, image_hw: Tuple[int, int]) -> CifCafConfig:
        return CifCafConfig(
            stride=self.cif_meta.stride,
            image_hw=tuple(image_hw),
            cifhr=cif_hr.CifHrConfig(
                v_threshold=self.cif_hr_v_threshold,
                spacing=self.hr_spacing,
                min_scale=self.cif_meta.decoder_min_scale,
                max_active=self.cif_hr_max_active),
            seeds=seeds.SeedsConfig(
                threshold=self.seed_threshold,
                max_seeds=self.max_seeds),
            # first growth pass always consumes candidates at the normal
            # threshold (reference relaxes only the second pass,
            # cifcaf.cpp:~380); a flood of relaxed candidates here would
            # evict the strong ones from the static top-C budget
            caf=caf_scored.CafScoredConfig(
                score_th=self.caf_score_th,
                max_candidates=self.max_caf_candidates),
            # --force-complete-pose: a separately thresholded candidate set
            # (reference --force-complete-caf-th, decoder/cifcaf.py:~60)
            # with a doubled budget, consumed only by the second pass
            caf_fc=(caf_scored.CafScoredConfig(
                score_th=self.force_complete_caf_th,
                max_candidates=2 * self.max_caf_candidates)
                if self.force_complete else None),
            growth=growth.GrowthConfig(
                keypoint_threshold=self.keypoint_threshold,
                keypoint_threshold_rel=self.keypoint_threshold_rel,
                reverse_match=self.reverse_match,
                connection_blend=self.connection_blend,
                max_poses=self.max_poses,
                force_complete=self.force_complete),
            nms=nms.NMSConfig(
                instance_threshold=self.instance_threshold,
                # --force-complete-pose implies keypoint_threshold 0.0 at
                # NMS time (reference decoder/cifcaf.py configure), or the
                # joints placed by the relaxed second pass are zeroed again
                keypoint_threshold=(0.0 if self.force_complete
                                    else self.keypoint_threshold)),
        )

    def _decoder_for(self, image_hw: Tuple[int, int]):
        key = tuple(image_hw)
        if key not in self._decoders:
            LOG.info('compiling decoder for image size %s', key)
            self._decoders[key] = make_batch_decoder(
                cif_meta=self.cif_meta, caf_meta=self.caf_meta,
                config=self.config_for(key))
        return self._decoders[key]

    def decoded_to_annotations(self, decoded_i) -> List[Annotation]:
        """Convert one image's DecodedPoses slice to Annotation objects."""
        xyv = np.asarray(decoded_i.xyv)
        joint_scales = np.asarray(decoded_i.joint_scales)
        scores = np.asarray(decoded_i.scores)
        valid = np.asarray(decoded_i.valid)

        annotations = []
        order = np.argsort(-scores)
        for p in order:
            if not valid[p]:
                continue
            ann = Annotation(
                self.cif_meta.keypoints,
                self.caf_meta.skeleton,
                sigmas=self.cif_meta.sigmas,
                score_weights=self.cif_meta.score_weights)
            ann.data[:] = xyv[p]
            ann.joint_scales[:] = joint_scales[p]
            ann.fixed_score = float(scores[p])
            annotations.append(ann)
        return annotations

    def __call__(self, fields) -> List[Annotation]:
        """Decode a single image: fields = [cif (F,5,H,W), caf (E,9,H,W)]."""
        cif_field = np.asarray(fields[self.cif_meta.head_index])
        caf_field = self._caf_field(fields, axis=0)
        h, w = cif_field.shape[-2:]
        stride = self.cif_meta.stride
        image_hw = ((h - 1) * stride + 1, (w - 1) * stride + 1)
        self._debug_visualize(cif_field, caf_field, image_hw)
        decode = self._decoder_for(image_hw)
        decoded = decode(cif_field[None], caf_field[None])
        return self.decoded_to_annotations(
            type(decoded)(*[x[0] for x in decoded]))

    def _debug_visualize(self, cif_field, caf_field, image_hw) -> None:
        """Render decoder-internal debug views when --debug-indices is set.

        Reference parity: visualizer hooks inside the decode call stack
        (``visualizer/cifhr.py``, ``visualizer/seeds.py``); runs unjitted on
        host copies and only when explicitly requested.
        """
        from .. import visualizer  # pylint: disable=import-outside-toplevel

        if not visualizer.Base.all_indices:
            return
        import jax.numpy as jnp  # pylint: disable=import-outside-toplevel

        from ..models.heads import split_fields  # pylint: disable=import-outside-toplevel

        config = self.config_for(image_hw)
        stride = config.stride
        cif = split_fields(jnp.asarray(cif_field), self.cif_meta)
        h, w = cif.conf.shape[-2:]
        jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        x_px = (ii + cif.vec[:, 0, 0]) * stride
        y_px = (jj + cif.vec[:, 0, 1]) * stride
        scale_px = cif.scale[:, 0] * stride

        cif_act = np.stack([
            np.asarray(cif.conf),
            np.asarray(cif.vec[:, 0, 0]), np.asarray(cif.vec[:, 0, 1]),
            np.asarray(cif.spread[:, 0]), np.asarray(cif.scale[:, 0]),
        ], axis=1)
        visualizer.Cif(self.cif_meta).predicted(cif_act)

        caf = split_fields(jnp.asarray(caf_field), self.caf_meta)
        caf_act = np.stack([
            np.asarray(caf.conf),
            np.asarray(caf.vec[:, 0, 0]), np.asarray(caf.vec[:, 0, 1]),
            np.asarray(caf.vec[:, 1, 0]), np.asarray(caf.vec[:, 1, 1]),
            np.asarray(caf.spread[:, 0]), np.asarray(caf.spread[:, 1]),
            np.asarray(caf.scale[:, 0]), np.asarray(caf.scale[:, 1]),
        ], axis=1)
        visualizer.Caf(self.caf_meta).predicted(caf_act)

        hr = cif_hr.accumulate(cif.conf, x_px, y_px, scale_px,
                               out_hw=config.hr_hw, config=config.cifhr)
        visualizer.CifHr(self.cif_meta).predicted(
            np.asarray(hr), spacing=config.cifhr.spacing)

        sds = seeds.select(cif.conf, x_px, y_px, scale_px, hr,
                           hr_spacing=config.cifhr.spacing,
                           config=config.seeds)
        visualizer.Seeds(field_names=self.cif_meta.keypoints).predicted(
            np.stack([np.asarray(sds.v), np.asarray(sds.f).astype(np.float32),
                      np.asarray(sds.x), np.asarray(sds.y),
                      np.asarray(sds.s)], axis=-1))

    def batch_decoded(self, fields):
        """On-device batched decode, returning the static-shaped
        ``DecodedPoses`` tensors (still device arrays — possibly sharded
        over a multi-process global mesh; the multi-process ``--dp-eval``
        path all_gathers these before the host transfer, SURVEY §7
        "multi-host eval")."""
        cif_fields = fields[self.cif_meta.head_index]
        caf_fields = self._caf_field(fields, axis=1)
        h, w = cif_fields.shape[-2:]
        stride = self.cif_meta.stride
        image_hw = ((h - 1) * stride + 1, (w - 1) * stride + 1)
        decode = self._decoder_for(image_hw)
        return decode(cif_fields, caf_fields)

    def annotations_from_decoded(self, decoded_np,
                                 batch_size: int) -> List[List[Annotation]]:
        """Host extraction: numpy ``DecodedPoses`` -> per-image annotation
        lists (first ``batch_size`` images; the rest is dp padding)."""
        dropped_cif = int(decoded_np.n_dropped_cif.sum())
        dropped_caf = int(decoded_np.n_dropped_caf.sum())
        dropped_poses = int(decoded_np.n_dropped_poses.sum())
        if dropped_cif or dropped_caf or dropped_poses:
            LOG.warning(
                'decode budget overflow in this batch: %d CifHr cells '
                '(raise --cifhr-max-active), %d CAF candidates, '
                '%d seed poses (raise --decoder-max-poses) dropped',
                dropped_cif, dropped_caf, dropped_poses)
        return [
            self.decoded_to_annotations(
                type(decoded_np)(*[x[i] for x in decoded_np]))
            for i in range(batch_size)
        ]

    def batch_fields(self, fields, metas=None) -> List[List[Annotation]]:
        decoded = self.batch_decoded(fields)
        # single device->host transfer for the whole batch, then slice
        decoded_np = type(decoded)(*[np.asarray(x) for x in decoded])
        batch_size = fields[self.cif_meta.head_index].shape[0]
        return self.annotations_from_decoded(decoded_np, batch_size)
