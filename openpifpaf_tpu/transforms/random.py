"""Random composition helpers.

Reference parity: ``src/openpifpaf/transforms/random.py:~10``.
"""

from __future__ import annotations

import numpy as np

from .preprocess import Preprocess


class RandomApply(Preprocess):
    def __init__(self, transform, probability, rng=None):
        self.transform = transform
        self.probability = probability
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        if self.rng.random() > self.probability:
            return image, anns, Preprocess.init_meta(image, meta)
        return self.transform(image, anns, meta)


class RandomChoice(Preprocess):
    def __init__(self, transforms, probabilities=None, rng=None):
        self.transforms = list(transforms)
        self.probabilities = probabilities
        self.rng = rng or np.random.default_rng()

    def __call__(self, image, anns, meta):
        i = self.rng.choice(len(self.transforms), p=self.probabilities)
        t = self.transforms[i]
        if t is None:
            return image, anns, Preprocess.init_meta(image, meta)
        return t(image, anns, meta)


class DeterministicEqualChoice(Preprocess):
    """Choose by hash of meta (stable across epochs, for val transforms)."""

    def __init__(self, transforms, salt=0):
        self.transforms = list(transforms)
        self.salt = salt

    def __call__(self, image, anns, meta):
        meta = Preprocess.init_meta(image, meta)
        i = (meta.get('dataset_index', 0) + self.salt) % len(self.transforms)
        t = self.transforms[i]
        if t is None:
            return image, anns, meta
        return t(image, anns, meta)
