"""CifDet encoder: ground-truth boxes -> detection field targets.

Reference parity: ``src/openpifpaf/encoder/cifdet.py`` — per category,
paint the box center neighborhood with confidence, center offsets and the
box size as a (w, h) regression.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .annrescaler import AnnRescaler
from .. import headmeta


@dataclasses.dataclass
class CifDetEncoder:
    meta: headmeta.CifDet
    side_length: int = 4

    def __call__(self, image, anns, meta_info=None) -> dict:
        f = self.meta.n_fields
        stride = self.meta.stride
        if isinstance(image, np.ndarray):
            h_px, w_px = image.shape[-3:-1] if image.ndim == 3 else image.shape
        else:
            w_px, h_px = image.size
        h = (h_px - 1) // stride + 1
        w = (w_px - 1) // stride + 1

        rescaler = AnnRescaler(stride)
        bg = rescaler.bg_mask(anns, (w_px, h_px), (h, w))

        conf = np.zeros((f, h, w), np.float32)
        conf_mask = np.broadcast_to(bg, (f, h, w)).copy()
        vec = np.zeros((f, 2, 2, h, w), np.float32)
        vec_mask = np.zeros((f, 2, h, w), bool)
        scale = np.zeros((f, 0, h, w), np.float32)
        scale_mask = np.zeros((f, 0, h, w), bool)
        closest = np.full((f, h, w), np.inf, np.float32)

        s_l = self.side_length
        offset = (s_l - 1) / 2.0

        for ann in anns:
            if getattr(ann, 'iscrowd', False):
                continue
            bbox = getattr(ann, 'bbox', None)
            category_id = getattr(ann, 'category_id', 1)
            if callable(bbox):
                bbox = bbox()
            if bbox is None or category_id is None:
                continue
            fi = category_id - 1
            if not 0 <= fi < f:
                continue
            bx, by, bw, bh = np.asarray(bbox, np.float32) / stride
            cx, cy = bx + bw / 2.0, by + bh / 2.0
            i0 = int(np.round(cx - offset))
            j0 = int(np.round(cy - offset))
            for j in range(max(0, j0), min(h, j0 + s_l)):
                for i in range(max(0, i0), min(w, i0 + s_l)):
                    d2 = (cx - i) ** 2 + (cy - j) ** 2
                    if d2 >= closest[fi, j, i]:
                        continue
                    closest[fi, j, i] = d2
                    core = (abs(cx - i) < 1.0) and (abs(cy - j) < 1.0)
                    if core:
                        conf[fi, j, i] = 1.0
                    conf_mask[fi, j, i] = True
                    vec[fi, 0, 0, j, i] = cx - i
                    vec[fi, 0, 1, j, i] = cy - j
                    vec[fi, 1, 0, j, i] = bw
                    vec[fi, 1, 1, j, i] = bh
                    vec_mask[fi, :, j, i] = True

        return {
            'conf': conf, 'conf_mask': conf_mask,
            'vec': vec, 'vec_mask': vec_mask,
            'scale': scale, 'scale_mask': scale_mask,
        }
