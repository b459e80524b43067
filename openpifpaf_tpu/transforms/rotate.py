"""Rotation augmentations.

Reference parity: ``src/openpifpaf/transforms/rotate.py:~20`` —
``RotateBy90`` (exact, keeps all pixels) and ``RotateUniform`` (small
random angles).
"""

from __future__ import annotations

import numpy as np
import PIL.Image

from .preprocess import Preprocess


def _rotate_points(xy: np.ndarray, angle_deg: float, center, new_center):
    ang = np.radians(angle_deg)
    rot = np.array([[np.cos(ang), -np.sin(ang)],
                    [np.sin(ang), np.cos(ang)]], np.float32)
    return (xy - center) @ rot.T + new_center


class RotateBy90(Preprocess):
    def __init__(self, angle_perturbation=0.0, fixed_angle=None, rng=None):
        self.angle_perturbation = angle_perturbation
        self.fixed_angle = fixed_angle
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        angle = self.fixed_angle if self.fixed_angle is not None \
            else float(self.rng.choice([0, 90, 180, 270]))
        if angle == 0:
            return image, anns, meta
        w, h = image.size
        # PIL rotates counter-clockwise with expand
        image = image.rotate(angle, expand=True,
                             fillcolor=(124, 116, 104))
        nw, nh = image.size
        center = np.array(((w - 1) / 2.0, (h - 1) / 2.0))
        new_center = np.array(((nw - 1) / 2.0, (nh - 1) / 2.0))
        for ann in anns:
            ann.data[:, :2] = _rotate_points(ann.data[:, :2], -angle,
                                             center, new_center)
        meta['rotation'] = {'angle': angle, 'width': nw, 'height': nh,
                            'orig_width': w, 'orig_height': h}
        meta['width_height'] = np.array((nw, nh))
        meta['valid_area'] = np.array((0.0, 0.0, nw - 1.0, nh - 1.0))
        return image, anns, meta


class RotateUniform(Preprocess):
    def __init__(self, max_angle=30.0, rng=None):
        self.max_angle = max_angle
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        angle = float(self.rng.uniform(-self.max_angle, self.max_angle))
        if abs(angle) < 0.1:
            return image, anns, meta
        w, h = image.size
        image = image.rotate(angle, expand=False, resample=PIL.Image.BILINEAR,
                             fillcolor=(124, 116, 104))
        center = np.array(((w - 1) / 2.0, (h - 1) / 2.0))
        for ann in anns:
            ann.data[:, :2] = _rotate_points(ann.data[:, :2], -angle,
                                             center, center)
        meta['rotation'] = {'angle': angle, 'width': w, 'height': h,
                            'orig_width': w, 'orig_height': h}
        return image, anns, meta
