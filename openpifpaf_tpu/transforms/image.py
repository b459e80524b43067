"""Image-only augmentations: color jitter, blur, JPEG compression.

Reference parity: ``src/openpifpaf/transforms/image.py:~30``.
"""

from __future__ import annotations

import io

import numpy as np
import PIL.Image
import PIL.ImageEnhance
import PIL.ImageFilter

from .preprocess import Preprocess


class ColorTint(Preprocess):
    def __init__(self, max_shift=0.4, rng=None):
        self.max_shift = max_shift
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        for enhance in (PIL.ImageEnhance.Color, PIL.ImageEnhance.Contrast,
                        PIL.ImageEnhance.Brightness):
            factor = 1.0 + float(self.rng.uniform(-self.max_shift,
                                                  self.max_shift))
            image = enhance(image).enhance(factor)
        return image, anns, meta


class Blur(Preprocess):
    def __init__(self, max_sigma=5.0, rng=None):
        self.max_sigma = max_sigma
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        sigma = float(self.rng.uniform(0.0, self.max_sigma))
        image = image.filter(PIL.ImageFilter.GaussianBlur(sigma))
        return image, anns, meta


class JpegCompression(Preprocess):
    def __init__(self, quality_range=(50, 100), rng=None):
        self.quality_range = quality_range
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        quality = int(self.rng.integers(*self.quality_range))
        buf = io.BytesIO()
        image.save(buf, 'JPEG', quality=quality)
        buf.seek(0)
        return PIL.Image.open(buf).convert('RGB'), anns, meta


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ImageToNumpy(Preprocess):
    """PIL -> normalized NHWC float32 (the tensor boundary)."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = mean
        self.std = std

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        arr = np.asarray(image, np.float32) / 255.0
        arr = (arr - self.mean) / self.std
        return arr, anns, meta
