"""openpifpaf_tpu — TPU-native composite-field perception engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
openpifpaf reference (``mahdinobar/openpifpaf``): bottom-up pose estimation
and tracking with CIF/CAF composite fields, decoded fully on-device.

Reference parity: ``src/openpifpaf/__init__.py`` — subpackage exports plus
plugin registration at import time.
"""

__version__ = '0.1.0'

from . import annotation
from . import configurable
from . import headmeta
from . import signal_
from .annotation import Annotation, AnnotationDet
from .configurable import Configurable

from . import plugin


def _register_plugins():
    plugin.register()


# subpackages that register things import lazily to keep import fast;
# plugin registration pulls in datasets/models as needed.
_register_plugins()
