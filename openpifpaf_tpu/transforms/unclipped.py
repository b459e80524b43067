"""Unclipped-area helpers.

Reference parity: ``src/openpifpaf/transforms/unclipped.py`` —
``UnclippedArea`` / ``UnclippedSides`` drop annotations whose visible
(in-frame) portion is too small after cropping, so heavily-clipped
instances don't generate misleading targets.
"""

from __future__ import annotations

import logging

import numpy as np

from .preprocess import Preprocess

LOG = logging.getLogger(__name__)


def _clipped_bbox_fraction(ann, width: float, height: float) -> float:
    bbox = ann.bbox() if callable(getattr(ann, 'bbox', None)) else \
        getattr(ann, 'bbox', None)
    if bbox is None:
        return 1.0
    x, y, w, h = [float(v) for v in bbox]
    if w <= 0 or h <= 0:
        return 0.0
    x0, y0 = max(0.0, x), max(0.0, y)
    x1, y1 = min(width, x + w), min(height, y + h)
    visible = max(0.0, x1 - x0) * max(0.0, y1 - y0)
    return visible / (w * h)


class UnclippedArea(Preprocess):
    """Drop annotations with less than ``threshold`` of their area in frame."""

    def __init__(self, *, threshold: float = 0.5):
        self.threshold = threshold

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        w, h = meta['width_height']
        kept = [ann for ann in anns
                if getattr(ann, 'iscrowd', False)
                or _clipped_bbox_fraction(ann, w, h) >= self.threshold]
        if len(kept) != len(anns):
            LOG.debug('unclipped area: %d -> %d anns', len(anns), len(kept))
        return image, kept, meta


class UnclippedSides(Preprocess):
    """Drop annotations clipped on more than ``max_clipped_sides`` sides."""

    def __init__(self, *, margin: float = 10.0, max_clipped_sides: int = 2):
        self.margin = margin
        self.max_clipped_sides = max_clipped_sides

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        w, h = meta['width_height']
        kept = []
        for ann in anns:
            if getattr(ann, 'iscrowd', False):
                kept.append(ann)
                continue
            bbox = ann.bbox() if callable(getattr(ann, 'bbox', None)) else \
                getattr(ann, 'bbox', None)
            if bbox is None:
                kept.append(ann)
                continue
            x, y, bw, bh = [float(v) for v in bbox]
            clipped = sum((
                x < self.margin,
                y < self.margin,
                x + bw > w - self.margin,
                y + bh > h - self.margin,
            ))
            if clipped <= self.max_clipped_sides:
                kept.append(ann)
        return image, kept, meta
