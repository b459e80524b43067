"""Model zoo: backbones, composite-field heads and the Shell wrapper."""

from .base import BASE_FACTORIES, BaseNetworkSpec, register_basenet
from .factory import CHECKPOINT_URLS, Factory, local_checkpoint_path
from .heads import CompositeField4, FieldComponents, split_fields
from .shell import Model, Shell
from . import checkpoint

__all__ = [
    'BASE_FACTORIES', 'BaseNetworkSpec', 'register_basenet',
    'CHECKPOINT_URLS', 'Factory', 'local_checkpoint_path',
    'CompositeField4', 'FieldComponents', 'split_fields',
    'Model', 'Shell', 'checkpoint',
]
