"""Checkpoint migrations: mutate old checkpoints to the current layout.

Reference parity: ``src/openpifpaf/network/model_migration.py:~10`` — the
reference keeps a ``MODEL_MIGRATION`` set of fixers applied on load because
it pickles whole modules.  This framework's npz checkpoints are
self-describing, so migrations operate on the flat path dict: each fixer
takes and returns ``{path: array}`` plus the json header, and they run in
order when a checkpoint's ``format_version`` is older than current.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, List, Tuple

import numpy as np

LOG = logging.getLogger(__name__)

CURRENT_FORMAT_VERSION = 1

Fixer = Callable[[Dict[str, np.ndarray], dict],
                 Tuple[Dict[str, np.ndarray], dict]]

# ordered list of (introduced_in_version, fixer); a checkpoint at version v
# gets every fixer with introduced_in_version > v
MODEL_MIGRATION: List[Tuple[int, Fixer]] = []


def register_migration(version: int):
    def deco(fn: Fixer) -> Fixer:
        MODEL_MIGRATION.append((version, fn))
        MODEL_MIGRATION.sort(key=lambda t: t[0])
        return fn
    return deco


def migrate(flat: Dict[str, np.ndarray], header: dict):
    """Apply all fixers newer than the checkpoint's format version."""
    version = header.get('format_version', 0)
    for introduced, fixer in MODEL_MIGRATION:
        if introduced > version:
            LOG.info('applying checkpoint migration %s (v%d)',
                     fixer.__name__, introduced)
            flat, header = fixer(flat, header)
    header['format_version'] = CURRENT_FORMAT_VERSION
    return flat, header


@register_migration(1)
def strip_module_prefixes(flat, header):
    """v0 -> v1: drop legacy ``module.`` wrappers (DataParallel-style)."""
    out = {}
    for path, value in flat.items():
        parts = [p for p in path.split('/') if p != 'module.']
        out['/'.join(parts)] = value
    return out, header
