"""Training subsystem: optimizer factories and the Trainer loop."""

from .optimize import OptimizeFactory
from .trainer import Trainer, TrainState

__all__ = ['OptimizeFactory', 'Trainer', 'TrainState']
