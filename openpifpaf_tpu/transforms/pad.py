"""Padding transforms.

Reference parity: ``src/openpifpaf/transforms/pad.py:~15`` — ``CenterPad``
(pad symmetrically to a target square) and ``CenterPadTight`` (pad up to
the next multiple of a stride — keeps shapes jit-static for eval).
"""

from __future__ import annotations

import numpy as np
import PIL.ImageOps

from .preprocess import Preprocess, translate_annotations


def _pad(image, anns, meta, ltrb):
    left, top, right, bottom = ltrb
    if not any(ltrb):
        return image, anns, meta
    image = PIL.ImageOps.expand(image, border=(left, top, right, bottom),
                                fill=(124, 116, 104))
    anns = translate_annotations(anns, left, top)
    meta['offset'] = meta['offset'] - np.array((left, top), float)
    meta['valid_area'] = meta['valid_area'] + np.array(
        (left, top, 0.0, 0.0))
    w, h = image.size
    meta['width_height'] = np.array((w, h))
    return image, anns, meta


class CenterPad(Preprocess):
    def __init__(self, target_size):
        if isinstance(target_size, int):
            target_size = (target_size, target_size)
        self.target_size = target_size

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        w, h = image.size
        tw, th = self.target_size
        left = max(0, (tw - w) // 2)
        top = max(0, (th - h) // 2)
        right = max(0, tw - w - left)
        bottom = max(0, th - h - top)
        return _pad(image, anns, meta, (left, top, right, bottom))


class CenterPadTight(Preprocess):
    """Pad to the next multiple of ``multiple`` (plus 1), centered."""

    def __init__(self, multiple: int = 16):
        self.multiple = multiple

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        w, h = image.size
        tw = ((w - 1) // self.multiple + 1) * self.multiple + 1
        th = ((h - 1) // self.multiple + 1) * self.multiple + 1
        left = (tw - w) // 2
        top = (th - h) // 2
        right = tw - w - left
        bottom = th - h - top
        return _pad(image, anns, meta, (left, top, right, bottom))
