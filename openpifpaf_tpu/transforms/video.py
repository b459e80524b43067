"""Video-frame preprocessing transforms.

Reference parity: ``src/openpifpaf/transforms/`` ``impute.py`` /
``deinterlace`` — cleanup of interlaced or partially-corrupted video
frames before the pose pipeline.
"""

from __future__ import annotations

import numpy as np
import PIL.Image

from .preprocess import Preprocess


class Deinterlace(Preprocess):
    """Drop every second scan line and resize back (removes comb artifacts
    from interlaced footage)."""

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        if isinstance(image, np.ndarray):
            half = image[::2]
            image = np.repeat(half, 2, axis=0)[:image.shape[0]]
            return image, anns, meta
        w, h = image.size
        image = image.resize((w, h // 2), PIL.Image.NEAREST)
        image = image.resize((w, h), PIL.Image.BILINEAR)
        return image, anns, meta


class ImputeNaN(Preprocess):
    """Replace non-finite pixel values (corrupted frames / capture glitches)
    with the frame mean."""

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        if not isinstance(image, np.ndarray):
            return image, anns, meta
        bad = ~np.isfinite(image)
        if bad.any():
            fill = float(np.nanmean(np.where(bad, np.nan, image)))
            image = np.where(bad, fill, image)
        return image, anns, meta
