"""Preprocess base class and meta conventions.

Reference parity: ``src/openpifpaf/transforms/preprocess.py:~10`` — every
transform implements ``__call__(image, anns, meta)`` and records enough in
``meta`` for predictions to be mapped back to original image coordinates
(``Annotation.inverse_transform``).

Meta invariant:  ``x_original = (x_transformed + offset) / scale``.
"""

from __future__ import annotations

import copy
from typing import List

import numpy as np


class Preprocess:
    def __call__(self, image, anns, meta):
        raise NotImplementedError

    @staticmethod
    def init_meta(image, meta=None) -> dict:
        meta = dict(meta) if meta else {}
        if isinstance(image, np.ndarray):
            w, h = image.shape[1], image.shape[0]
        else:
            w, h = image.size
        meta.setdefault('offset', np.array((0.0, 0.0)))
        meta.setdefault('scale', np.array((1.0, 1.0)))
        meta.setdefault('rotation', {'angle': 0.0, 'width': None, 'height': None})
        meta.setdefault('valid_area', np.array((0.0, 0.0, w - 1, h - 1)))
        meta.setdefault('hflip', False)
        meta.setdefault('width_height', np.array((w, h)))
        # first init wins: the original canvas, for inverse transforms
        # (width_height above tracks the *current* canvas and is updated
        # by crop/pad/rotate)
        meta.setdefault('original_width_height', meta['width_height'])
        meta.setdefault('horizontal_swap', None)
        return meta


class AnnotationCopy(Preprocess):
    def __call__(self, image, anns, meta):
        return image, copy.deepcopy(anns), meta


def rescale_annotations(anns: List, x_scale: float, y_scale: float):
    scale4 = np.array([x_scale, y_scale, x_scale, y_scale])
    for ann in anns:
        if getattr(ann, 'data', None) is not None:
            ann.data[:, 0] *= x_scale
            ann.data[:, 1] *= y_scale
        if getattr(ann, 'joint_scales', None) is not None:
            ann.joint_scales *= (x_scale + y_scale) / 2.0
        if getattr(ann, 'fixed_bbox', None) is not None:
            ann.fixed_bbox = np.asarray(ann.fixed_bbox, np.float32) * scale4
        # box-only annotations (AnnotationDet / AnnotationCrowd GT)
        if getattr(ann, 'data', None) is None \
                and getattr(ann, 'bbox', None) is not None:
            ann.bbox = np.asarray(ann.bbox, np.float32) * scale4
    return anns


def translate_annotations(anns: List, dx: float, dy: float):
    shift4 = np.array([dx, dy, 0.0, 0.0])
    for ann in anns:
        if getattr(ann, 'data', None) is not None:
            ann.data[:, 0] += dx
            ann.data[:, 1] += dy
        if getattr(ann, 'fixed_bbox', None) is not None:
            ann.fixed_bbox = np.asarray(ann.fixed_bbox, np.float32) + shift4
        if getattr(ann, 'data', None) is None \
                and getattr(ann, 'bbox', None) is not None:
            ann.bbox = np.asarray(ann.bbox, np.float32) + shift4
    return anns
