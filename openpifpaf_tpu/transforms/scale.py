"""Rescaling transforms.

Reference parity: ``src/openpifpaf/transforms/scale.py`` —
``RescaleAbsolute`` (long edge to target, ``:~30``), ``RescaleRelative``
(random factor range) and ``ScaleMix``.
"""

from __future__ import annotations

import numpy as np
import PIL.Image

from .preprocess import Preprocess, rescale_annotations

_RESAMPLE = PIL.Image.BILINEAR


def _rescale(image, anns, meta, target_wh):
    w, h = image.size
    tw, th = int(target_wh[0]), int(target_wh[1])
    if (tw, th) == (w, h):
        return image, anns, meta
    image = image.resize((tw, th), _RESAMPLE)
    x_scale = (tw - 1) / (w - 1) if w > 1 else 1.0
    y_scale = (th - 1) / (h - 1) if h > 1 else 1.0
    anns = rescale_annotations(anns, x_scale, y_scale)
    meta['offset'] = meta['offset'] * np.array((x_scale, y_scale))
    meta['scale'] = meta['scale'] * np.array((x_scale, y_scale))
    meta['valid_area'] = meta['valid_area'] * np.array(
        (x_scale, y_scale, x_scale, y_scale))
    return image, anns, meta


class RescaleAbsolute(Preprocess):
    """Rescale so the long edge equals ``long_edge`` (preserving aspect)."""

    def __init__(self, long_edge, *, fast=False):
        self.long_edge = long_edge
        self.fast = fast

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        w, h = image.size
        target = self.long_edge
        if isinstance(target, (tuple, list)):
            target = int(np.random.default_rng().integers(target[0], target[1] + 1))
        s = target / max(w, h)
        return _rescale(image, anns, meta,
                        (round(w * s), round(h * s)))


class RescaleRelative(Preprocess):
    """Rescale by a random factor in ``scale_range``."""

    def __init__(self, scale_range=(0.4, 2.0), *, power_law=True,
                 stretch_range=None, rng=None):
        self.scale_range = scale_range
        self.power_law = power_law
        self.stretch_range = stretch_range
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        lo, hi = self.scale_range
        if self.power_law:
            log_s = self.rng.uniform(np.log2(lo), np.log2(hi))
            s = 2.0 ** log_s
        else:
            s = self.rng.uniform(lo, hi)
        sx = sy = s
        if self.stretch_range is not None:
            stretch = self.rng.uniform(*self.stretch_range)
            sx = s * np.sqrt(stretch)
            sy = s / np.sqrt(stretch)
        w, h = image.size
        return _rescale(image, anns, meta,
                        (max(2, round(w * sx)), max(2, round(h * sy))))


class ScaleMix(Preprocess):
    """Upscale small-instance images, downscale large-instance ones.

    Reference: ``transforms/scale.py`` ScaleMix (``:~120``).
    """

    def __init__(self, scale_threshold, *, upscale_factor=2.0,
                 downscale_factor=0.5, rng=None):
        self.scale_threshold = scale_threshold
        self.upscale_factor = upscale_factor
        self.downscale_factor = downscale_factor
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        scales = []
        for ann in anns:
            if getattr(ann, 'iscrowd', False):
                continue
            m = ann.data[:, 2] > 0
            if m.sum() < 2:
                continue
            xy = ann.data[m, :2]
            scales.append(np.sqrt(
                max(1.0, (xy[:, 0].max() - xy[:, 0].min()))
                * max(1.0, (xy[:, 1].max() - xy[:, 1].min()))))
        if not scales:
            return image, anns, meta
        all_small = max(scales) < self.scale_threshold
        all_large = min(scales) > self.scale_threshold
        w, h = image.size
        if all_small:
            return _rescale(image, anns, meta,
                            (round(w * self.upscale_factor),
                             round(h * self.upscale_factor)))
        if all_large:
            return _rescale(image, anns, meta,
                            (round(w * self.downscale_factor),
                             round(h * self.downscale_factor)))
        return image, anns, meta
