"""CifDet decoder: detection variant.

Reference parity: ``src/openpifpaf/csrc/src/decoder/cifdet.cpp:~30`` and
``src/openpifpaf/decoder/cifdet.py:~30`` — CifDetHr center accumulation,
per-category seed selection, box regression from the (w, h) vector and
box IoU NMS.  All on-device, static shapes.
"""

from __future__ import annotations

import argparse
import functools
import logging
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .decoder import Decoder
from .. import headmeta
from ..annotation import AnnotationDet
from ..models.heads import split_fields
from ..ops import cif_hr, seeds as seeds_mod
from ..ops.common import masked_top_k

LOG = logging.getLogger(__name__)


class CifDet(Decoder):
    seed_threshold = 0.3
    instance_threshold = 0.15
    iou_threshold = 0.5
    max_detections = 64
    hr_spacing = 2

    def __init__(self, meta: headmeta.CifDet):
        self.meta = meta
        self._decoders = {}

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('CifDet decoder')
        group.add_argument('--cifdet-seed-threshold',
                           default=cls.seed_threshold, type=float)
        group.add_argument('--cifdet-iou-threshold',
                           default=cls.iou_threshold, type=float)
        group.add_argument('--cifdet-max-detections',
                           default=cls.max_detections, type=int)

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.seed_threshold = args.cifdet_seed_threshold
        cls.iou_threshold = args.cifdet_iou_threshold
        cls.max_detections = args.cifdet_max_detections

    @classmethod
    def match(cls, head_metas) -> bool:
        return any(isinstance(m, headmeta.CifDet) for m in head_metas)

    @classmethod
    def factory(cls, head_metas) -> List['CifDet']:
        return [cls(m) for m in head_metas if isinstance(m, headmeta.CifDet)]

    # ------------------------------------------------------------------
    def _decode_single(self, field, *, image_hw):
        """field: (F, 5, H, W) raw CifDet head output."""
        stride = self.meta.stride
        comp = split_fields(field, self.meta)
        f, h, w = comp.conf.shape
        jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        cx = (ii + comp.vec[:, 0, 0]) * stride
        cy = (jj + comp.vec[:, 0, 1]) * stride
        bw = jnp.maximum(comp.vec[:, 1, 0], 0.1) * stride
        bh = jnp.maximum(comp.vec[:, 1, 1], 0.1) * stride

        sp = self.hr_spacing
        hr_hw = ((image_hw[0] + sp - 1) // sp, (image_hw[1] + sp - 1) // sp)
        hr = cif_hr.accumulate(
            comp.conf, cx, cy, jnp.minimum(bw, bh) * 0.5,
            out_hw=hr_hw,
            config=cif_hr.CifHrConfig(spacing=sp, sigma_factor=0.1,
                                      min_sigma_px=2.0))
        from ..ops.common import gather_field_grouped
        v = 0.9 * gather_field_grouped(hr, jnp.arange(f, dtype=jnp.int32),
                                       cx, cy, sp) + 0.1 * comp.conf

        # local max + top-k
        vmax = jax.lax.reduce_window(v, -jnp.inf, jax.lax.max,
                                     (1, 3, 3), (1, 1, 1), 'SAME')
        mask = (v > self.seed_threshold) & (v >= vmax)
        vals, idx, valid = masked_top_k(v.reshape(-1), mask.reshape(-1),
                                        self.max_detections)
        cat = (idx // (h * w)).astype(jnp.int32)
        x0 = cx.reshape(-1)[idx] - bw.reshape(-1)[idx] / 2
        y0 = cy.reshape(-1)[idx] - bh.reshape(-1)[idx] / 2
        bws = bw.reshape(-1)[idx]
        bhs = bh.reshape(-1)[idx]
        score = jnp.where(valid, vals, 0.0)

        # per-category IoU NMS (sorted desc already)
        x1 = x0 + bws
        y1 = y0 + bhs
        ix0 = jnp.maximum(x0[:, None], x0[None, :])
        iy0 = jnp.maximum(y0[:, None], y0[None, :])
        ix1 = jnp.minimum(x1[:, None], x1[None, :])
        iy1 = jnp.minimum(y1[:, None], y1[None, :])
        inter = jnp.maximum(0.0, ix1 - ix0) * jnp.maximum(0.0, iy1 - iy0)
        area = bws * bhs
        iou = inter / jnp.maximum(1e-6, area[:, None] + area[None, :] - inter)
        n = score.shape[0]
        same_cat = cat[:, None] == cat[None, :]
        earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]
        sup = jnp.any(same_cat & earlier & (iou > self.iou_threshold)
                      & (score[None, :] > 0), axis=1)
        score = jnp.where(sup, 0.0, score)

        return dict(category=cat + 1, score=score,
                    bbox=jnp.stack([x0, y0, bws, bhs], axis=-1))

    def _decoder_for(self, image_hw):
        key = tuple(image_hw)
        if key not in self._decoders:
            fn = functools.partial(self._decode_single, image_hw=key)
            self._decoders[key] = jax.jit(jax.vmap(fn))
        return self._decoders[key]

    def _to_annotations(self, out_i) -> List[AnnotationDet]:
        cats = np.asarray(out_i['category'])
        scores = np.asarray(out_i['score'])
        bboxes = np.asarray(out_i['bbox'])
        anns = []
        for c, s, bb in zip(cats, scores, bboxes):
            if s < self.instance_threshold:
                continue
            anns.append(AnnotationDet(self.meta.categories).set(int(c), float(s), bb))
        return anns

    def __call__(self, fields) -> List[AnnotationDet]:
        field = np.asarray(fields[self.meta.head_index])
        h, w = field.shape[-2:]
        stride = self.meta.stride
        image_hw = ((h - 1) * stride + 1, (w - 1) * stride + 1)
        out = self._decoder_for(image_hw)(field[None])
        return self._to_annotations({k: v[0] for k, v in out.items()})

    def batch_fields(self, fields, metas=None) -> List[List[AnnotationDet]]:
        field = fields[self.meta.head_index]
        h, w = field.shape[-2:]
        stride = self.meta.stride
        image_hw = ((h - 1) * stride + 1, (w - 1) * stride + 1)
        out = self._decoder_for(image_hw)(field)
        batch_size = field.shape[0]
        return [self._to_annotations({k: np.asarray(v)[i]
                                      for k, v in out.items()})
                for i in range(batch_size)]
