"""CIFAR-10 plugin: classification-as-detection toy workload.

Reference parity: ``src/openpifpaf/plugins/cifar10/datamodule.py:~20`` —
the reference frames CIFAR-10 classification as a tiny CifDet problem and
uses it heavily in tests/CI because it trains in seconds.
"""

from .datamodule import Cifar10


def register():
    from ...datasets.factory import DATAMODULES

    DATAMODULES['cifar10'] = Cifar10
