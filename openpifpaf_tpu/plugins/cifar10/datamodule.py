"""CIFAR-10 as a CifDet datamodule.

Reference parity: ``src/openpifpaf/plugins/cifar10/datamodule.py:~20`` —
each 32x32 image is one full-image detection of its class (a CifDet head
with 10 categories).  Data source: the standard CIFAR-10 python batches
under ``--cifar10-root`` when present; otherwise a deterministic synthetic
stand-in (per-class color/pattern blobs) so the plugin stays usable in
download-free environments like this one.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np
import PIL.Image

from ... import encoder, headmeta, metric, transforms
from ...datasets import (DataModule, Loader, collate_images_anns_meta,
                         collate_images_targets_meta)
from ...datasets.loader import Dataset

CATEGORIES = ['airplane', 'automobile', 'bird', 'cat', 'deer',
              'dog', 'frog', 'horse', 'ship', 'truck']


def _load_cifar_batches(root: str, train: bool):
    """Read the standard python-version CIFAR-10 batch files."""
    batch_dir = os.path.join(root, 'cifar-10-batches-py')
    names = ([f'data_batch_{i}' for i in range(1, 6)] if train
             else ['test_batch'])
    images, labels = [], []
    for name in names:
        with open(os.path.join(batch_dir, name), 'rb') as f:
            batch = pickle.load(f, encoding='bytes')
        images.append(np.asarray(batch[b'data'], np.uint8)
                      .reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        labels.extend(int(l) for l in batch[b'labels'])
    return np.concatenate(images), np.asarray(labels, np.int64)


class Cifar10Dataset(Dataset):
    def __init__(self, images: np.ndarray, labels: np.ndarray, preprocess):
        self.images = images
        self.labels = labels
        self.preprocess = preprocess

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index):
        image = PIL.Image.fromarray(self.images[index], 'RGB')
        w, h = image.size
        anns = [{
            'bbox': [0.0, 0.0, float(w), float(h)],
            'category_id': int(self.labels[index]) + 1,
            'iscrowd': 0,
            'keypoints': np.zeros((0, 3), np.float32),
        }]
        meta = {'dataset_index': index, 'image_id': index,
                'file_name': f'cifar10_{index}.png'}
        return self.preprocess(image, anns, meta)


def _synthetic_cifar(n_images: int, seed: int):
    """Deterministic per-class patterns (stand-in when no download)."""
    rng = np.random.default_rng(seed)
    class_rng = np.random.default_rng(4242)
    palette = class_rng.integers(40, 255, (len(CATEGORIES), 2, 3))
    labels = rng.integers(0, len(CATEGORIES), n_images)
    yy, xx = np.mgrid[0:32, 0:32]
    images = np.empty((n_images, 32, 32, 3), np.uint8)
    for i, label in enumerate(labels):
        bg, fg = palette[label]
        img = np.tile(bg[None, None, :], (32, 32, 1)).astype(np.float32)
        img += rng.normal(0.0, 12.0, (32, 32, 3))
        # class-specific pattern frequency
        phase = (label + 1) * (xx + 2 * yy) / 6.0
        img += (np.sin(phase)[:, :, None] * 0.5 + 0.5) * (fg - bg)[None, None]
        images[i] = np.clip(img, 0, 255).astype(np.uint8)
    return images, labels


class Cifar10(DataModule):
    root = 'data-cifar10'
    n_synthetic = 64          # synthetic fallback sizes
    n_synthetic_val = 16
    download = False

    def __init__(self):
        cifdet = headmeta.CifDet('cifdet', 'cifar10', categories=CATEGORIES)
        cifdet.upsample_stride = 2
        self.head_metas = [cifdet]

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('data module Cifar10')
        group.add_argument('--cifar10-root', default=cls.root,
                           help='directory with cifar-10-batches-py/')
        group.add_argument('--cifar10-n-synthetic', default=cls.n_synthetic,
                           type=int,
                           help='synthetic dataset size when no real data')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.root = args.cifar10_root
        cls.n_synthetic = args.cifar10_n_synthetic

    # ------------------------------------------------------------------
    def _have_real_data(self) -> bool:
        return os.path.isdir(os.path.join(self.root, 'cifar-10-batches-py'))

    def _data(self, train: bool):
        if self._have_real_data():
            return _load_cifar_batches(self.root, train)
        n = self.n_synthetic if train else self.n_synthetic_val
        return _synthetic_cifar(n, seed=0 if train else 1)

    def _preprocess(self):
        # pad 32 -> 33 so the image size is ≡1 (mod stride) like all other
        # datamodules (field grid arithmetic, heads.py PixelShuffle crop)
        return transforms.Compose([
            transforms.NormalizeAnnotations(keypoints=[], skeleton=[]),
            transforms.CenterPad(33),
            transforms.TRAIN_TRANSFORM,
            encoder.Encoders(encoder.factory(self.head_metas)),
        ])

    def _eval_preprocess(self):
        return transforms.Compose([
            transforms.NormalizeAnnotations(keypoints=[], skeleton=[]),
            transforms.CenterPad(33),
            transforms.EVAL_TRANSFORM,
        ])

    def train_loader(self):
        images, labels = self._data(train=True)
        dataset = Cifar10Dataset(images, labels, self._preprocess())
        return Loader(dataset, batch_size=self.batch_size, shuffle=True,
                      collate_fn=collate_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def val_loader(self):
        images, labels = self._data(train=False)
        dataset = Cifar10Dataset(images, labels, self._preprocess())
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_images_targets_meta,
                      num_workers=self.loader_workers, drop_last=True)

    def eval_loader(self):
        images, labels = self._data(train=False)
        dataset = Cifar10Dataset(images, labels, self._eval_preprocess())
        return Loader(dataset, batch_size=self.batch_size, shuffle=False,
                      collate_fn=collate_images_anns_meta,
                      num_workers=self.loader_workers, drop_last=False)

    def metrics(self):
        return [metric.Coco(
            ground_truth_from_loader=True,
            iou_type='bbox',
            category_ids=list(range(1, len(CATEGORIES) + 1)))]
