"""Datasets subsystem: DataModule contract, registry, loaders, collate."""

from .collate import (collate_images_anns_meta, collate_images_targets_meta,
                      collate_tracking_images_anns_meta,
                      collate_tracking_images_targets_meta)
from .factory import DATAMODULES, cli, configure, factory
from .loader import Dataset, ImageList, Loader, NumpyImageList
from .loader_with_reset import LoaderWithReset
from .module import DataModule
from .multimodule import MultiDataModule
from .torch_dataset import TorchDatasetAdapter

__all__ = [
    'collate_images_anns_meta', 'collate_images_targets_meta',
    'collate_tracking_images_anns_meta',
    'collate_tracking_images_targets_meta',
    'DATAMODULES', 'cli', 'configure', 'factory',
    'Dataset', 'ImageList', 'Loader', 'LoaderWithReset', 'NumpyImageList',
    'DataModule', 'MultiDataModule', 'TorchDatasetAdapter',
]
