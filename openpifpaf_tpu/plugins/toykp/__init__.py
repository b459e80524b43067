"""Synthetic keypoint plugin (fast CI workload)."""


def register():
    from .datamodule import ToyKp  # pylint: disable=import-outside-toplevel
    from .crowd import ToyCrowd  # pylint: disable=import-outside-toplevel
    from .toywb import ToyWb  # pylint: disable=import-outside-toplevel
    from ...datasets import DATAMODULES  # pylint: disable=import-outside-toplevel
    DATAMODULES['toykp'] = ToyKp
    DATAMODULES['toycrowd'] = ToyCrowd
    DATAMODULES['toywb'] = ToyWb
