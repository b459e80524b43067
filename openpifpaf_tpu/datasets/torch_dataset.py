"""Adapter for torch-style datasets.

Reference parity: ``src/openpifpaf/datasets/torch_dataset.py`` — lets a
``torch.utils.data.Dataset`` (or anything with ``__len__``/``__getitem__``
returning a PIL image or ``(image, anns)``) feed the predictor/training
pipeline.  TPU-first: no torch dependency — duck-typed protocol; the
preprocess chain runs on the host and the loader yields numpy batches.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import PIL.Image

from .loader import Dataset


class TorchDatasetAdapter(Dataset):
    """Wrap a map-style dataset so its items flow through ``preprocess``.

    Items may be ``PIL.Image``, ``numpy`` HWC uint8 array, or a tuple whose
    first element is one of those and whose second is a list of
    COCO-style annotation dicts.
    """

    def __init__(self, dataset, preprocess=None, *,
                 index_field: Optional[str] = 'dataset_index'):
        self.dataset = dataset
        self.preprocess = preprocess
        self.index_field = index_field

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, index: int):
        item = self.dataset[index]
        anns = []
        if isinstance(item, tuple):
            image, anns = item[0], list(item[1]) if len(item) > 1 else []
        else:
            image = item
        if isinstance(image, np.ndarray):
            image = PIL.Image.fromarray(np.asarray(image, np.uint8))
        if not isinstance(image, PIL.Image.Image):
            raise TypeError(
                f'dataset item {index} is {type(image)!r}; expected a PIL '
                'image, HWC uint8 array, or (image, anns) tuple')

        meta = {}
        if self.index_field:
            meta[self.index_field] = index
        if self.preprocess is not None:
            image, anns, meta = self.preprocess(image, anns, meta)
        return image, anns, meta
