"""Frame-pair transforms for tracking training.

Reference parity: ``src/openpifpaf/transforms/pair.py`` and the single-
image-to-pseudo-tracking conversion in
``src/openpifpaf/plugins/posetrack/cocokpst.py:~30`` — a single annotated
image becomes a (previous, current) frame pair by applying a simulated
camera/subject motion to a copy; track ids link the two frames' instances.

Applied *after* the single-frame augmentation stack and the numpy tensor
boundary, so the jitter operates on fixed-size float arrays.
"""

from __future__ import annotations

import copy
import logging

import numpy as np

from .preprocess import Preprocess, translate_annotations

LOG = logging.getLogger(__name__)


class ImageToTracking(Preprocess):
    """(image, anns, meta) -> frame pair with simulated motion.

    The input image (numpy HWC, post ``ImageToNumpy``) becomes frame t-1;
    frame t is a translated copy (camera pan).  Track ids are assigned per
    instance and shared across the pair.

    ``max_instance_shift_px`` additionally offsets each frame-t annotation
    independently (simulated subject motion) — but the PIXELS of the
    instance cannot move with it in a flat translated copy, so any nonzero
    value makes frame-t labels disagree with the image by that much: label
    noise in training targets and a broken ground truth at eval time.  It
    therefore defaults to 0 (pan-only motion); only enable it for
    robustness experiments, never in an eval pipeline.
    """

    def __init__(self, max_shift_px: float = 16.0,
                 max_instance_shift_px: float = 0.0, seed: int = None):
        self.max_shift_px = max_shift_px
        self.max_instance_shift_px = max_instance_shift_px
        self.rng = np.random.default_rng(seed)

    @staticmethod
    def _shift_image(image: np.ndarray, dx: int, dy: int) -> np.ndarray:
        out = np.zeros_like(image)
        h, w = image.shape[:2]
        sx0, sx1 = max(0, -dx), min(w, w - dx)
        sy0, sy1 = max(0, -dy), min(h, h - dy)
        out[sy0 + dy:sy1 + dy, sx0 + dx:sx1 + dx] = image[sy0:sy1, sx0:sx1]
        return out

    def __call__(self, image, anns, meta):
        image = np.asarray(image)
        anns1 = list(anns)
        for track_id, ann in enumerate(anns1):
            if getattr(ann, 'id_', -1) < 0:
                ann.id_ = track_id

        dx = int(self.rng.uniform(-self.max_shift_px, self.max_shift_px))
        dy = int(self.rng.uniform(-self.max_shift_px, self.max_shift_px))
        image2 = self._shift_image(image, dx, dy)
        anns2 = copy.deepcopy(anns1)
        translate_annotations(anns2, dx, dy)
        h, w = image.shape[:2]
        for ann in anns2:
            jitter = self.rng.uniform(-self.max_instance_shift_px,
                                      self.max_instance_shift_px, size=2)
            translate_annotations([ann], jitter[0], jitter[1])
            # mark out-of-frame keypoints invisible in frame t
            out = ((ann.data[:, 0] < 0) | (ann.data[:, 0] >= w)
                   | (ann.data[:, 1] < 0) | (ann.data[:, 1] >= h))
            ann.data[out, 2] = 0.0

        meta = Preprocess.init_meta(image, meta)
        # every pseudo-pair is its own sequence: the two frames derive
        # from ONE image, so track state must never leak into the next
        # dataset item (TrackingPose segments on sequence_id)
        meta.setdefault('sequence_id', 'img{}'.format(
            meta.get('image_id', meta.get('dataset_index', id(anns1)))))
        return [image, image2], [anns1, anns2], meta


class SingleImage(Preprocess):
    """Apply a single-frame transform to each frame of a pair."""

    def __init__(self, transform: Preprocess):
        self.transform = transform

    def __call__(self, images, anns_pair, meta):
        out_images, out_anns = [], []
        out_meta = meta
        for image, anns in zip(images, anns_pair):
            image, anns, out_meta = self.transform(image, anns, dict(meta))
            out_images.append(image)
            out_anns.append(anns)
        return out_images, out_anns, out_meta


class SyncPair(Preprocess):
    """Apply a *random* single-frame transform to both frames of a pair
    with synchronized randomness.

    Reference parity: ``src/openpifpaf/transforms/pair.py:~20`` restores
    the rng state before transforming the second frame, so both frames
    draw identical augmentation parameters — same hflip decision, same
    scale factor, same crop window (modulo annotation-dependent shifts,
    which read as extra simulated camera motion and stay
    label-consistent).  Here every ``np.random.Generator`` reachable from
    the wrapped transform is snapshotted and restored.
    """

    _CHILD_ATTRS = ('transform', 'transforms', 'preprocess',
                    'preprocess_list', 'frame_steps', 'pair_steps')

    def __init__(self, transform: Preprocess):
        self.transform = transform

    @classmethod
    def _generators(cls, root):
        found, seen = [], set()

        def visit(t):
            if t is None or id(t) in seen:
                return
            seen.add(id(t))
            rng = getattr(t, 'rng', None)
            if isinstance(rng, np.random.Generator) \
                    and not any(rng is g for g in found):
                found.append(rng)
            for name in cls._CHILD_ATTRS:
                child = getattr(t, name, None)
                if isinstance(child, (list, tuple)):
                    for c in child:
                        visit(c)
                elif child is not None and not callable(getattr(
                        child, 'encode', None)):   # skip strings
                    visit(child)

        visit(root)
        return found

    def __call__(self, images, anns_pair, meta):
        rngs = self._generators(self.transform)
        states = [copy.deepcopy(r.bit_generator.state) for r in rngs]
        out_images, out_anns = [], []
        out_meta = dict(meta)
        for i, (image, anns) in enumerate(zip(images, anns_pair)):
            if i > 0:
                for r, s in zip(rngs, states):
                    r.bit_generator.state = copy.deepcopy(s)
            image, anns, out_meta = self.transform(image, anns, dict(meta))
            out_images.append(image)
            out_anns.append(anns)
        return out_images, out_anns, out_meta
