"""In-memory pose / detection annotation objects.

Reference parity: ``src/openpifpaf/annotation.py`` — ``Annotation``
(``:~20``) holds a ``(K, 3)`` xyv array plus per-joint scales, computes a
weighted score (``:~90``) and emits COCO-format ``json_data()`` (``:~130``,
coordinates rounded to 2 decimals).  ``AnnotationDet`` (``:~170``) is the
box variant.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class Base:
    """Common interface for annotation types."""

    def json_data(self):
        raise NotImplementedError

    def inverse_transform(self, meta):
        raise NotImplementedError


class Annotation(Base):
    """A single decoded pose.

    ``data`` is a ``(K, 3)`` float array of (x, y, v) per keypoint where v is
    the confidence (0 = not detected).  ``joint_scales`` is a ``(K,)`` array
    of per-joint scales (pixels) used for occupancy and OKS-style scoring.
    """

    def __init__(self, keypoints: Sequence[str],
                 skeleton: Sequence[Tuple[int, int]],
                 *,
                 sigmas: Optional[Sequence[float]] = None,
                 score_weights: Optional[Sequence[float]] = None,
                 categories: Optional[Sequence[str]] = None,
                 category_id: int = 1,
                 suppress_score_index: Optional[int] = None):
        self.keypoints = list(keypoints)
        self.skeleton = [tuple(s) for s in skeleton]
        self.sigmas = np.asarray(sigmas, dtype=np.float32) if sigmas is not None else None
        self.categories = categories
        self.category_id = category_id
        self.suppress_score_index = suppress_score_index

        n = len(self.keypoints)
        self.data = np.zeros((n, 3), dtype=np.float32)
        self.joint_scales = np.zeros((n,), dtype=np.float32)
        self.fixed_score: Optional[float] = None
        self.fixed_bbox: Optional[np.ndarray] = None
        self.id_: int = -1  # tracking id
        self.decoding_order: List = []
        self.frame_number: int = 0

        if score_weights is not None:
            score_weights = np.asarray(score_weights, dtype=np.float32)
        else:
            score_weights = np.ones((n,), dtype=np.float32)
        self.score_weights = score_weights

    # construction helpers ---------------------------------------------
    def add(self, joint_i: int, xyv) -> 'Annotation':
        self.data[joint_i] = xyv
        return self

    def set(self, data, joint_scales=None, *, fixed_score=None,
            fixed_bbox=None) -> 'Annotation':
        self.data = np.asarray(data, dtype=np.float32).reshape(len(self.keypoints), 3)
        if joint_scales is not None:
            self.joint_scales = np.asarray(joint_scales, dtype=np.float32)
        self.fixed_score = fixed_score
        self.fixed_bbox = fixed_bbox
        return self

    def rescale(self, scale_factor: float) -> 'Annotation':
        self.data[:, 0:2] *= scale_factor
        self.joint_scales *= scale_factor
        if self.fixed_bbox is not None:
            self.fixed_bbox = np.asarray(self.fixed_bbox) * scale_factor
        return self

    # scoring ----------------------------------------------------------
    @property
    def score(self) -> float:
        """Weighted pose score.

        Reference ``annotation.py:~90``: keypoint confidences sorted
        descending, multiplied by ``score_weights`` and normalized by the
        weight sum, so the weights emphasize the most-confident joints.
        """
        if self.fixed_score is not None:
            return float(self.fixed_score)
        v = self.data[:, 2].copy()
        if self.suppress_score_index is not None:
            v[self.suppress_score_index] = 0.0
        order = np.argsort(v)[::-1]
        v_sorted = v[order]
        return float((v_sorted * self.score_weights).sum()
                     / max(1e-8, self.score_weights.sum()))

    def scale(self) -> float:
        """Characteristic instance scale (bbox-area sqrt over valid joints)."""
        visible = self.data[:, 2] > 0.0
        if not np.any(visible):
            return 0.0
        xy = self.data[visible, :2]
        return float(np.sqrt(
            max(1e-8, (xy[:, 0].max() - xy[:, 0].min()))
            * max(1e-8, (xy[:, 1].max() - xy[:, 1].min()))))

    def bbox(self) -> np.ndarray:
        """(x, y, w, h) from valid joints, expanded by joint scales."""
        if self.fixed_bbox is not None:
            return np.asarray(self.fixed_bbox, dtype=np.float32)
        return self.bbox_from_keypoints(self.data, self.joint_scales)

    @staticmethod
    def bbox_from_keypoints(kps: np.ndarray, joint_scales: np.ndarray) -> np.ndarray:
        m = kps[:, 2] > 0.0
        if not np.any(m):
            return np.zeros((4,), dtype=np.float32)
        s = np.maximum(joint_scales[m], 2.0)
        x = np.min(kps[m, 0] - s)
        y = np.min(kps[m, 1] - s)
        w = np.max(kps[m, 0] + s) - x
        h = np.max(kps[m, 1] + s) - y
        return np.array([x, y, w, h], dtype=np.float32)

    # export -----------------------------------------------------------
    def json_data(self, coordinate_digits: int = 2) -> dict:
        """COCO-result-format dict (same rounding as the reference)."""
        kps = np.copy(self.data)
        kps[kps[:, 2] == 0.0, :2] = 0.0
        data = {
            'keypoints': np.around(kps, coordinate_digits).reshape(-1).tolist(),
            'bbox': [round(float(c), coordinate_digits) for c in self.bbox()],
            'score': max(0.001, round(float(self.score), 3)),
            'category_id': self.category_id,
        }
        if self.id_ >= 0:
            data['id_'] = self.id_
        return data

    def inverse_transform(self, meta) -> 'Annotation':
        """Map back to original image coordinates using transform meta.

        Inverse application order is the reverse of the forward pipeline:
        scale/crop/pad (tracked in offset/scale) are undone first, then the
        rotation, then the horizontal flip.
        """
        ann = self.copy()
        ann.data[:, 0] += meta['offset'][0]
        ann.data[:, 1] += meta['offset'][1]
        ann.data[:, 0] /= meta['scale'][0]
        ann.data[:, 1] /= meta['scale'][1]
        ann.joint_scales /= meta['scale'][0]

        rotation = meta.get('rotation')
        if isinstance(rotation, dict) and rotation.get('angle', 0.0):
            angle = rotation['angle']
            rw, rh = rotation['width'], rotation['height']
            ow = rotation.get('orig_width', rw)
            oh = rotation.get('orig_height', rh)
            ang = np.radians(angle)
            rot = np.array([[np.cos(ang), -np.sin(ang)],
                            [np.sin(ang), np.cos(ang)]], dtype=np.float32)
            c_new = np.array([(rw - 1) / 2.0, (rh - 1) / 2.0], np.float32)
            c_old = np.array([(ow - 1) / 2.0, (oh - 1) / 2.0], np.float32)
            ann.data[:, :2] = (ann.data[:, :2] - c_new) @ rot.T + c_old

        if meta.get('hflip', False):
            # after undoing offset/scale the frame is the original canvas
            w = meta.get('original_width_height', meta['width_height'])[0]
            ann.data[:, 0] = -ann.data[:, 0] + (w - 1)
            if meta.get('horizontal_swap') is not None:
                ann.data[:] = meta['horizontal_swap'](ann.data)
        return ann

    def copy(self) -> 'Annotation':
        out = Annotation(self.keypoints, self.skeleton,
                         sigmas=self.sigmas,
                         score_weights=self.score_weights,
                         categories=self.categories,
                         category_id=self.category_id,
                         suppress_score_index=self.suppress_score_index)
        out.data = np.copy(self.data)
        out.joint_scales = np.copy(self.joint_scales)
        out.fixed_score = self.fixed_score
        out.fixed_bbox = None if self.fixed_bbox is None else np.copy(self.fixed_bbox)
        out.id_ = self.id_
        out.frame_number = self.frame_number
        return out

    def __repr__(self):
        return (f'Annotation(category_id={self.category_id}, '
                f'score={self.score:.3f}, '
                f'n_visible={int((self.data[:, 2] > 0).sum())})')


class AnnotationDet(Base):
    """A single decoded detection box.

    Reference: ``annotation.py:~170``.
    """

    def __init__(self, categories: Sequence[str]):
        self.categories = list(categories)
        self.category_id: Optional[int] = None
        self.score: float = 0.0
        self.bbox: Optional[np.ndarray] = None  # (x, y, w, h)

    def set(self, category_id: int, score: float, bbox) -> 'AnnotationDet':
        self.category_id = int(category_id)
        self.score = float(score)
        self.bbox = np.asarray(bbox, dtype=np.float32)
        return self

    @property
    def category(self) -> str:
        return self.categories[self.category_id - 1]

    def json_data(self) -> dict:
        return {
            'category_id': self.category_id,
            'category': self.category,
            'score': max(0.001, round(float(self.score), 3)),
            'bbox': [round(float(c), 2) for c in self.bbox],
        }

    def inverse_transform(self, meta) -> 'AnnotationDet':
        ann = AnnotationDet(self.categories)
        bbox = np.copy(self.bbox)
        bbox[:2] += np.asarray(meta['offset'], dtype=np.float32)
        bbox[0] /= meta['scale'][0]
        bbox[1] /= meta['scale'][1]
        bbox[2] /= meta['scale'][0]
        bbox[3] /= meta['scale'][1]
        if meta.get('hflip', False):
            w = meta.get('original_width_height', meta['width_height'])[0]
            bbox[0] = -(bbox[0] + bbox[2]) + (w - 1)
        ann.set(self.category_id, self.score, bbox)
        return ann

    def __repr__(self):
        return (f'AnnotationDet(category_id={self.category_id}, '
                f'score={self.score:.3f})')


class AnnotationCrowd(Base):
    """A crowd region (ground truth only, never decoded).

    Reference: ``annotation.py:~210`` — marks COCO ``iscrowd`` regions so
    metrics and visualizers can ignore detections inside them.
    """

    def __init__(self, categories: Sequence[str]):
        self.categories = list(categories)
        self.category_id: Optional[int] = None
        self.bbox: Optional[np.ndarray] = None  # (x, y, w, h)

    def set(self, category_id: int, bbox) -> 'AnnotationCrowd':
        self.category_id = int(category_id)
        self.bbox = np.asarray(bbox, dtype=np.float32)
        return self

    @property
    def category(self) -> str:
        return self.categories[self.category_id - 1]

    def json_data(self) -> dict:
        return {
            'category_id': self.category_id,
            'category': self.category,
            'iscrowd': 1,
            'bbox': [round(float(c), 2) for c in self.bbox],
        }

    def inverse_transform(self, meta) -> 'AnnotationCrowd':
        ann = AnnotationCrowd(self.categories)
        bbox = np.copy(self.bbox)
        bbox[:2] += np.asarray(meta['offset'], dtype=np.float32)
        bbox[0] /= meta['scale'][0]
        bbox[1] /= meta['scale'][1]
        bbox[2] /= meta['scale'][0]
        bbox[3] /= meta['scale'][1]
        if meta.get('hflip', False):
            w = meta.get('original_width_height', meta['width_height'])[0]
            bbox[0] = -(bbox[0] + bbox[2]) + (w - 1)
        ann.set(self.category_id, bbox)
        return ann

    def __repr__(self):
        return f'AnnotationCrowd(category_id={self.category_id})'
