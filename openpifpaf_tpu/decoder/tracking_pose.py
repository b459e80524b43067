"""TrackingPose decoder: per-frame poses + TCAF track association.

Reference parity: ``src/openpifpaf/decoder/tracking_pose.py:~30`` — builds
per-frame CifCaf poses, associates them across the frame pair via TCAF
connections, maintains ``frame_number`` and track ids with single-frame
fallback.  TPU-first: the current frame's pose decode and the
(prev x curr) association matrix + greedy id matching run as jitted XLA
programs (``ops/tracking.py``); only the id bookkeeping between frames
stays on host (it is inherently sequential across frames).
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Optional, Tuple

import numpy as np

from .cifcaf import CifCaf
from .decoder import Decoder
from .. import headmeta
from ..annotation import Annotation
from ..ops import TrackingConfig, make_associator

LOG = logging.getLogger(__name__)


class TrackingPose(Decoder):
    # class-level configuration (reference tracking_pose.py statics)
    forget_after = 5            # frames a track survives without a match
    track_threshold = 0.05      # min association score (ops.TrackingConfig)
    tcaf_score_th = 0.2
    max_track_candidates = 128
    single_seed_threshold = None  # optionally relax seeds for tracking

    def __init__(self, cif_meta: headmeta.Cif, caf_meta: headmeta.Caf,
                 tcaf_meta: headmeta.Tcaf):
        self.cif_meta = cif_meta
        self.caf_meta = caf_meta
        self.tcaf_meta = tcaf_meta
        self.cifcaf = CifCaf(cif_meta, caf_meta)
        self._associators = {}
        self.reset()
        from ..signal_ import Signal
        Signal.subscribe('eval_reset', self.reset)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('TrackingPose decoder')
        group.add_argument('--tracking-forget-after',
                           default=cls.forget_after, type=int,
                           help='frames a track survives without a match')
        group.add_argument('--tracking-threshold',
                           default=cls.track_threshold, type=float,
                           help='minimum TCAF association score to link')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.forget_after = args.tracking_forget_after
        cls.track_threshold = args.tracking_threshold

    @classmethod
    def match(cls, head_metas) -> bool:
        return (len(head_metas) >= 3
                and isinstance(head_metas[0], headmeta.Cif)
                and isinstance(head_metas[1], headmeta.Caf)
                and isinstance(head_metas[2], headmeta.Tcaf))

    @classmethod
    def factory(cls, head_metas) -> List['TrackingPose']:
        if not cls.match(head_metas):
            return []
        return [cls(head_metas[0], head_metas[1], head_metas[2])]

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self.next_track_id = 1
        self._sequence = None
        self.reset_tracks()

    def reset_tracks(self) -> None:
        """Drop the track memory (sequence boundary); ids keep counting
        so they stay unique across sequences."""
        self.frame_number = 0
        # state of the previous frame (static arrays + host id list)
        self.prev_xyv = None        # (P, K, 3) px
        self.prev_valid = None      # (P,) float
        self.prev_ids = None        # (P,) int host array
        self.prev_ages = None       # (P,) int host array

    def tracking_config(self) -> TrackingConfig:
        return TrackingConfig(
            score_th=self.tcaf_score_th,
            max_candidates=self.max_track_candidates,
            min_match_score=self.track_threshold,
            max_tracks=self.cifcaf.max_poses)

    def _associator_for(self, field_hw: Tuple[int, int]):
        key = tuple(field_hw)
        if key not in self._associators:
            LOG.info('compiling tcaf associator for field size %s', key)
            self._associators[key] = make_associator(
                tcaf_meta=self.tcaf_meta, config=self.tracking_config())
        return self._associators[key]

    def _debug_visualize_tcaf(self, tcaf_field) -> None:
        """Render the TCAF debug view when --debug-indices is set
        (mirrors ``cifcaf.py::_debug_visualize``; reference hook:
        ``src/openpifpaf/visualizer/tcaf.py``)."""
        from .. import visualizer  # pylint: disable=import-outside-toplevel

        if not visualizer.Base.all_indices:
            return
        import jax.numpy as jnp  # pylint: disable=import-outside-toplevel

        from ..models.heads import split_fields  # pylint: disable=import-outside-toplevel

        t = split_fields(jnp.asarray(tcaf_field), self.tcaf_meta)
        tcaf_act = np.stack([
            np.asarray(t.conf),
            np.asarray(t.vec[:, 0, 0]), np.asarray(t.vec[:, 0, 1]),
            np.asarray(t.vec[:, 1, 0]), np.asarray(t.vec[:, 1, 1]),
            np.asarray(t.spread[:, 0]), np.asarray(t.spread[:, 1]),
            np.asarray(t.scale[:, 0]), np.asarray(t.scale[:, 1]),
        ], axis=1)
        visualizer.Tcaf(self.tcaf_meta).predicted(tcaf_act)

    def _decode_frame(self, cif_field: np.ndarray, caf_field: np.ndarray):
        """One frame's static-shape pose decode (device)."""
        h, w = cif_field.shape[-2:]
        stride = self.cif_meta.stride
        image_hw = ((h - 1) * stride + 1, (w - 1) * stride + 1)
        decode = self.cifcaf._decoder_for(image_hw)  # pylint: disable=protected-access
        decoded = decode(cif_field[None], caf_field[None])
        return type(decoded)(*[x[0] for x in decoded])

    def _start_tracks(self, decoded) -> None:
        valid = np.asarray(decoded.valid, bool)
        n = valid.shape[0]
        self.prev_xyv = np.asarray(decoded.xyv)
        self.prev_valid = valid.astype(np.float32)
        self.prev_ids = np.full((n,), -1, np.int64)
        self.prev_ages = np.zeros((n,), np.int64)
        for p in np.nonzero(valid)[0]:
            self.prev_ids[p] = self.next_track_id
            self.next_track_id += 1

    def __call__(self, fields, meta: Optional[dict] = None) -> List[Annotation]:
        """Decode one frame pair.

        ``fields``: [cif (2, F, 5, h, w), caf (2, E, 9, h, w),
        tcaf (K, 9, h, w)] — frame 0 is the previous frame, frame 1 the
        current one (``models/tracking_base.py`` layout).

        ``meta['sequence_id']`` (when present) segments track state: a
        new sequence drops the track memory, so independent eval pairs
        never associate against a different image's poses and real
        sequences keep id continuity across their consecutive pairs.
        """
        sequence = (meta or {}).get('sequence_id')
        if sequence is not None and sequence != self._sequence:
            self._sequence = sequence
            self.reset_tracks()

        cif_pair = np.asarray(fields[self.cif_meta.head_index])
        caf_pair = np.asarray(fields[self.caf_meta.head_index])
        tcaf_field = np.asarray(fields[self.tcaf_meta.head_index])
        self._debug_visualize_tcaf(tcaf_field)

        if self.frame_number == 0 or self.prev_xyv is None:
            self._start_tracks(self._decode_frame(cif_pair[0], caf_pair[0]))

        decoded = self._decode_frame(cif_pair[1], caf_pair[1])
        curr_xyv = np.asarray(decoded.xyv)
        curr_valid = np.asarray(decoded.valid, bool)
        scores = np.asarray(decoded.scores)
        joint_scales = np.asarray(decoded.joint_scales)

        associate = self._associator_for(tcaf_field.shape[-2:])
        match, _ = associate(tcaf_field,
                             self.prev_xyv, self.prev_valid,
                             curr_xyv, curr_valid.astype(np.float32))
        match = np.asarray(match)

        # host id bookkeeping
        n = curr_valid.shape[0]
        curr_ids = np.full((n,), -1, np.int64)
        curr_ages = np.zeros((n,), np.int64)
        matched_prev = set()
        for q in np.nonzero(curr_valid)[0]:
            p = int(match[q])
            if p >= 0 and self.prev_ids[p] >= 0 and p not in matched_prev:
                curr_ids[q] = self.prev_ids[p]
                matched_prev.add(p)
            else:
                curr_ids[q] = self.next_track_id
                self.next_track_id += 1

        # carry over recently-lost tracks so they can recover (reference
        # track recovery window); appended into free (invalid) pose slots.
        free_slots = [q for q in range(n) if not curr_valid[q]]
        kept_xyv = curr_xyv.copy()
        kept_valid = curr_valid.astype(np.float32)
        for p in range(self.prev_valid.shape[0]):
            if self.prev_valid[p] <= 0 or p in matched_prev:
                continue
            age = self.prev_ages[p] + 1
            if age > self.forget_after or not free_slots:
                continue
            q = free_slots.pop(0)
            kept_xyv[q] = self.prev_xyv[p]
            kept_valid[q] = 1.0
            curr_ids[q] = self.prev_ids[p]
            curr_ages[q] = age

        self.prev_xyv = kept_xyv
        self.prev_valid = kept_valid
        self.prev_ids = curr_ids
        self.prev_ages = curr_ages
        self.frame_number += 1

        annotations = []
        order = np.argsort(-scores)
        for q in order:
            if not curr_valid[q]:
                continue
            ann = Annotation(
                self.cif_meta.keypoints, self.caf_meta.skeleton,
                sigmas=self.cif_meta.sigmas,
                score_weights=self.cif_meta.score_weights)
            ann.data[:] = curr_xyv[q]
            ann.joint_scales[:] = joint_scales[q]
            ann.fixed_score = float(scores[q])
            ann.id_ = int(curr_ids[q])
            annotations.append(ann)
        return annotations

    def batch_fields(self, fields, metas=None) -> List[List[Annotation]]:
        """Decode a batch of frame pairs (sequential: track state carries
        within a sequence; ``metas[i]['sequence_id']`` boundaries reset)."""
        cif = np.asarray(fields[self.cif_meta.head_index])
        caf = np.asarray(fields[self.caf_meta.head_index])
        tcaf = np.asarray(fields[self.tcaf_meta.head_index])
        batch_size = tcaf.shape[0]
        return [
            self([cif[2 * i:2 * i + 2], caf[2 * i:2 * i + 2], tcaf[i]],
                 meta=metas[i] if metas else None)
            for i in range(batch_size)
        ]
