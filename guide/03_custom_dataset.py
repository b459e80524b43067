"""Guide 3 — Writing a dataset plugin.

Mirrors the reference's ``guide/custom_dataset.ipynb`` / plugin docs
(``src/openpifpaf/plugins/``): a DataModule declares head metas (what the
network predicts), builds preprocessing + encoder pipelines, and registers
itself under a ``--dataset`` name.  External packages do the same from a
package named ``openpifpaf_tpu_<name>`` with a ``register()`` function.

Run: ``python guide/03_custom_dataset.py``.
"""

import numpy as np
import PIL.Image

from openpifpaf_tpu import datasets, encoder, headmeta, transforms
from openpifpaf_tpu.datasets import (DATAMODULES, DataModule, Loader,
                                     collate_images_targets_meta)
from openpifpaf_tpu.datasets.loader import Dataset

# --- 1. the dataset: three keypoints forming a triangle -------------------
KEYPOINTS = ['top', 'left', 'right']
SKELETON = [(1, 2), (2, 3), (3, 1)]   # 1-based, like COCO
SIGMAS = [0.05, 0.05, 0.05]
HFLIP = {'left': 'right', 'right': 'left'}
UPRIGHT_POSE = np.array([[0.0, -1.0, 2.0], [-1.0, 1.0, 2.0], [1.0, 1.0, 2.0]])


class TriangleDataset(Dataset):
    def __init__(self, n_images, image_size, preprocess):
        self.n = n_images
        self.size = image_size
        self.preprocess = preprocess

    def __len__(self):
        return self.n

    def __getitem__(self, index):
        rng = np.random.default_rng(index)
        img = np.zeros((self.size, self.size, 3), np.uint8)
        cx, cy = rng.uniform(0.3, 0.7, 2) * self.size
        r = 0.2 * self.size
        kps = np.array([[cx, cy - r, 2.0],
                        [cx - r, cy + r, 2.0],
                        [cx + r, cy + r, 2.0]], np.float32)
        for (x, y, _), color in zip(kps, np.eye(3) * 255):
            yy, xx = np.mgrid[0:self.size, 0:self.size]
            img[(yy - y) ** 2 + (xx - x) ** 2 < 16] = color
        anns = [{'keypoints': kps.reshape(-1).tolist(),
                 'bbox': [cx - r, cy - r, 2 * r, 2 * r], 'iscrowd': 0}]
        meta = {'dataset_index': index, 'file_name': f'triangle{index}'}
        return self.preprocess(PIL.Image.fromarray(img), anns, meta)


# --- 2. the datamodule -----------------------------------------------------
class Triangles(DataModule):
    image_size = 65

    def __init__(self):
        cif = headmeta.Cif('cif', 'triangles', keypoints=KEYPOINTS,
                           sigmas=SIGMAS, pose=UPRIGHT_POSE,
                           draw_skeleton=SKELETON)
        caf = headmeta.Caf('caf', 'triangles', keypoints=KEYPOINTS,
                           sigmas=SIGMAS, pose=UPRIGHT_POSE,
                           skeleton=SKELETON)
        self.head_metas = [cif, caf]

    def _preprocess(self):
        return transforms.Compose([
            transforms.NormalizeAnnotations(keypoints=KEYPOINTS,
                                            skeleton=SKELETON, sigmas=SIGMAS),
            transforms.RandomApply(transforms.HFlip(KEYPOINTS, HFLIP), 0.5),
            transforms.RescaleAbsolute(self.image_size),
            transforms.CenterPad(self.image_size),
            transforms.TRAIN_TRANSFORM,
            encoder.Encoders(encoder.factory(self.head_metas)),
        ])

    def train_loader(self):
        dataset = TriangleDataset(8, self.image_size, self._preprocess())
        return Loader(dataset, batch_size=4, shuffle=True,
                      collate_fn=collate_images_targets_meta, drop_last=True)

    def val_loader(self):
        return self.train_loader()


# --- 3. register + use -----------------------------------------------------
DATAMODULES['triangles'] = Triangles

datamodule = datasets.factory('triangles')
print('head metas:', [m.name for m in datamodule.head_metas])

# head metas get their head_index/base_stride from the model factory; for a
# standalone loader walk-through, attach them manually (stride 16 backbone)
for i, m in enumerate(datamodule.head_metas):
    m.head_index = i
    m.base_stride = 16

images, targets, metas = next(iter(datamodule.train_loader()))
print('image batch:', images.shape)                   # (4, 65, 65, 3) NHWC
for name, target in zip(('cif', 'caf'), targets):
    print(name, 'targets:', {k: np.asarray(v).shape
                             for k, v in target.items()})
assert images.shape == (4, 65, 65, 3)
print('guide 03 OK')
