"""openpifpaf_tpu — TPU-native composite-field perception engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
openpifpaf reference (``mahdinobar/openpifpaf``): bottom-up pose estimation
and tracking with CIF/CAF composite fields, decoded fully on-device.

Reference parity: ``src/openpifpaf/__init__.py`` — subpackage exports plus
plugin registration at import time.
"""

__version__ = '0.1.0'

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: repeated CLI invocations reuse
    compiled programs instead of paying the 20-40s TPU compile each run."""
    try:
        import jax

        cache_dir = _os.environ.get(
            'OPENPIFPAF_TPU_JAX_CACHE',
            _os.path.expanduser('~/.cache/openpifpaf_tpu/jax_cache'))
        if cache_dir and cache_dir != '0':
            jax.config.update('jax_compilation_cache_dir', cache_dir)
            # only cache expensive compiles (TPU programs); quick CPU
            # compiles are cheaper to redo than to load with machine-flag
            # mismatch warnings
            jax.config.update('jax_persistent_cache_min_compile_time_secs',
                              5.0)
    except Exception:  # pragma: no cover - never block import
        pass


_enable_compilation_cache()

from . import annotation
from . import configurable
from . import headmeta
from . import signal_
from .annotation import Annotation, AnnotationCrowd, AnnotationDet
from .configurable import Configurable

from . import plugin


def _register_plugins():
    plugin.register()


# subpackages that register things import lazily to keep import fast;
# plugin registration pulls in datasets/models as needed.
_register_plugins()

# reference API parity: ``openpifpaf.Predictor`` et al. live at the package
# top level (``src/openpifpaf/__init__.py``); resolve lazily so importing
# the package stays fast
_LAZY = {
    'Predictor': ('openpifpaf_tpu.predictor', 'Predictor'),
    'datasets': ('openpifpaf_tpu.datasets', None),
    'decoder': ('openpifpaf_tpu.decoder', None),
    'encoder': ('openpifpaf_tpu.encoder', None),
    'metric': ('openpifpaf_tpu.metric', None),
    'models': ('openpifpaf_tpu.models', None),
    'network': ('openpifpaf_tpu.models', None),   # reference's name
    'ops': ('openpifpaf_tpu.ops', None),
    'show': ('openpifpaf_tpu.show', None),
    'transforms': ('openpifpaf_tpu.transforms', None),
    'visualizer': ('openpifpaf_tpu.visualizer', None),
}


def __getattr__(name):
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(
            f'module {__name__!r} has no attribute {name!r}') from None
    import importlib
    module = importlib.import_module(module_name)
    return getattr(module, attr) if attr else module
