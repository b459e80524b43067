"""Checkpoint save/load for models.

Reference parity: the reference pickles whole torch modules
(``trainer.py:~300``) and migrates them on load
(``network/model_migration.py``).  TPU-first redesign: checkpoints are a
flat ``.npz`` of ``path/to/param`` arrays plus a JSON header describing the
architecture (basenet name, head metas, epoch) — self-describing, language-
neutral, and mmap-friendly.  Training-state checkpoints (optimizer, EMA) are
handled separately by the trainer via Orbax.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Tuple

import numpy as np

from .. import headmeta as headmeta_mod

_HEADMETA_TYPES = {
    'Cif': headmeta_mod.Cif,
    'Caf': headmeta_mod.Caf,
    'CifDet': headmeta_mod.CifDet,
    'Tcaf': headmeta_mod.Tcaf,
}


def flatten_tree(tree: Any, prefix: str = '') -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f'{prefix}{k}/'))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Any:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def headmeta_to_json(meta: headmeta_mod.Base) -> dict:
    d = dataclasses.asdict(meta)
    d = {k: (v.tolist() if isinstance(v, np.ndarray) else v)
         for k, v in d.items()}
    d['__type__'] = type(meta).__name__
    return d


def headmeta_from_json(d: dict) -> headmeta_mod.Base:
    d = dict(d)
    cls = _HEADMETA_TYPES[d.pop('__type__')]
    field_names = {f.name for f in dataclasses.fields(cls)}
    upsample = d.get('upsample_stride', 1)
    head_index = d.get('head_index')
    base_stride = d.get('base_stride')
    kwargs = {k: v for k, v in d.items() if k in field_names}
    if 'pose' in kwargs and kwargs['pose'] is not None:
        kwargs['pose'] = np.asarray(kwargs['pose'], dtype=np.float32)
    meta = cls(**kwargs)
    meta.upsample_stride = upsample
    meta.head_index = head_index
    meta.base_stride = base_stride
    return meta


def save(path: str, *, variables: Any, head_metas, basenet_name: str,
         base_stride: int, epoch: int = 0, extra_meta: dict = None) -> None:
    flat = flatten_tree(variables)
    header = {
        'format_version': 1,
        'basenet': basenet_name,
        'base_stride': base_stride,
        'epoch': epoch,
        'head_metas': [headmeta_to_json(m) for m in head_metas],
        'extra': extra_meta or {},
    }
    flat['__meta__'] = np.frombuffer(
        json.dumps(header).encode('utf-8'), dtype=np.uint8).copy()
    np.savez(path, **flat)


def load(path: str) -> Tuple[dict, Any]:
    """Returns (header, variables-pytree)."""
    with np.load(path, allow_pickle=False) as data:
        flat = {k: data[k] for k in data.files}
    header = json.loads(bytes(flat.pop('__meta__')).decode('utf-8'))
    header['head_metas'] = [headmeta_from_json(m) for m in header['head_metas']]
    return header, unflatten_tree(flat)
