"""Plugin discovery and registration.

Reference parity: ``src/openpifpaf/plugin.py:~20`` — discovers installed
``openpifpaf_*`` packages and calls each plugin module's ``register()``,
which populates the dataset / decoder / checkpoint registries.

Built-in plugins live in ``openpifpaf_tpu.plugins`` and are registered the
same way external ones are (external package prefix: ``openpifpaf_tpu_*``).
"""

from __future__ import annotations

import importlib
import logging
import pkgutil

LOG = logging.getLogger(__name__)

REGISTERED = {}  # name -> module


def register() -> None:
    """Discover and register all plugins (idempotent)."""
    from . import plugins  # built-ins; pylint: disable=import-outside-toplevel

    for _, name, _ in pkgutil.iter_modules(plugins.__path__):
        full_name = f'{plugins.__name__}.{name}'
        if full_name in REGISTERED:
            continue
        module = importlib.import_module(full_name)
        if hasattr(module, 'register'):
            try:
                module.register()
            except ImportError as e:  # pragma: no cover - partial installs
                LOG.warning('plugin %s failed to register: %s', full_name, e)
                continue
            REGISTERED[full_name] = module

    # external packages: openpifpaf_tpu_<name>
    for _, name, _ in pkgutil.iter_modules():
        if not name.startswith('openpifpaf_tpu_'):
            continue
        if name in REGISTERED:
            continue
        try:
            module = importlib.import_module(name)
        except ImportError as e:  # pragma: no cover
            LOG.warning('could not import plugin %s: %s', name, e)
            continue
        if hasattr(module, 'register'):
            module.register()
            REGISTERED[name] = module
