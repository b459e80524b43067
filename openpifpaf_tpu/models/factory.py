"""Model factory: build fresh models or load checkpoints.

Reference parity: ``src/openpifpaf/network/factory.py`` — ``Factory``
(``:~100``) builds a model either from ``--checkpoint`` (named or path) or
from ``--basenet`` fresh, attaches a ``CompositeField4`` head per head meta
and exposes ``CHECKPOINT_URLS`` (``:~30``).  In this environment there is no
network egress, so named checkpoints resolve through a local directory
(``CHECKPOINT_DIR``).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from . import checkpoint as checkpoint_mod
from .base import BASE_FACTORIES
from .heads import CompositeField4
from .shell import Model, Shell
from .tracking_base import TrackingModel, TrackingShell, is_tracking_metas
from .. import headmeta as headmeta_mod
from ..configurable import Configurable

# register built-in backbones
from . import shufflenetv2k  # noqa: F401  pylint: disable=unused-import
from . import resnet  # noqa: F401  pylint: disable=unused-import
from . import mobilenet  # noqa: F401  pylint: disable=unused-import
from . import squeezenet  # noqa: F401  pylint: disable=unused-import
from . import effnetv2  # noqa: F401  pylint: disable=unused-import
from . import swin  # noqa: F401  pylint: disable=unused-import
from . import xcit  # noqa: F401  pylint: disable=unused-import
from . import botnet  # noqa: F401  pylint: disable=unused-import
from . import hrformer  # noqa: F401  pylint: disable=unused-import

LOG = logging.getLogger(__name__)

# name -> filename; resolved against CHECKPOINT_DIR (reference:
# network/factory.py:~30 CHECKPOINT_URLS with torchhub download)
CHECKPOINT_URLS = {
    'shufflenetv2k16': 'shufflenetv2k16.npz',
    'shufflenetv2k30': 'shufflenetv2k30.npz',
    'resnet50': 'resnet50.npz',
}

CHECKPOINT_DIR = os.environ.get(
    'OPENPIFPAF_TPU_CHECKPOINT_DIR',
    os.path.expanduser('~/.cache/openpifpaf_tpu/checkpoints'))


def local_checkpoint_path(name: str) -> Optional[str]:
    if os.path.exists(name):
        return name
    if name in CHECKPOINT_URLS:
        path = os.path.join(CHECKPOINT_DIR, CHECKPOINT_URLS[name])
        if os.path.exists(path):
            return path
    return None


class Factory(Configurable):
    base_name: Optional[str] = None
    checkpoint: Optional[str] = None
    head_dropout: float = 0.0
    norm: str = 'batchnorm'
    bf16: bool = True          # compute in bfloat16 on TPU (params stay f32)
    upsample_stride: int = 1   # optional PixelShuffle in the heads
    cross_talk: float = 0.0    # CrossTalk train augmentation (nets.py:~120)

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('network configuration')
        group.add_argument('--checkpoint', default=cls.checkpoint,
                           help='checkpoint file or name to load')
        group.add_argument('--basenet', default=cls.base_name,
                           help=f'base network, one of {sorted(BASE_FACTORIES)}')
        group.add_argument('--head-dropout', default=cls.head_dropout,
                           type=float, help='[train] dropout before head convs')
        group.add_argument('--basenet-norm', default=cls.norm,
                           choices=('batchnorm', 'instancenorm', 'groupnorm'),
                           help='normalization layer in the backbone')
        group.add_argument('--no-bf16', dest='bf16', default=cls.bf16,
                           action='store_false',
                           help='compute in float32 instead of bfloat16')
        group.add_argument('--head-upsample-stride', default=cls.upsample_stride,
                           type=int, help='PixelShuffle factor in heads')
        group.add_argument('--cross-talk', default=cls.cross_talk, type=float,
                           help='[train] cross-talk batch augmentation factor')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.checkpoint = args.checkpoint
        cls.base_name = args.basenet
        cls.head_dropout = args.head_dropout
        cls.norm = args.basenet_norm
        cls.bf16 = args.bf16
        cls.upsample_stride = args.head_upsample_stride
        cls.cross_talk = args.cross_talk

    # ------------------------------------------------------------------
    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.bf16 else jnp.float32

    def factory(self, *, head_metas: Optional[Sequence[headmeta_mod.Base]] = None,
                rng: Optional[jax.Array] = None) -> Model:
        if self.checkpoint:
            model = self.from_checkpoint(self.checkpoint)
            if head_metas is not None \
                    and not self._heads_match(model.head_metas, head_metas):
                # transfer learning (reference network/factory.py:~180):
                # keep the backbone and any same-named heads, create the
                # rest fresh — e.g. warm-starting a tracking model
                # (CIF+CAF+TCAF) from a single-frame checkpoint
                model = self.transfer(model, head_metas, rng=rng)
            return model
        if not self.base_name:
            raise ValueError('either checkpoint or basenet must be given')
        if head_metas is None:
            raise ValueError('head_metas required to build a fresh model')
        model = self.from_scratch(self.base_name, head_metas)
        model.init(rng if rng is not None else jax.random.key(0))
        return model

    def build_module(self, basenet_name: str,
                     head_metas: Sequence[headmeta_mod.Base]) -> Model:
        """Construct the (uninitialized) Shell module + Model wrapper.

        Tracking models (any ``Tcaf`` head meta, or a ``t``-prefixed
        basenet name like the reference's ``tshufflenetv2k16``) get a
        ``TrackingShell`` over frame pairs (``tracking_base.py``).
        """
        tracking = is_tracking_metas(head_metas)
        resolved_name = basenet_name
        if basenet_name not in BASE_FACTORIES \
                and basenet_name.startswith('t') \
                and basenet_name[1:] in BASE_FACTORIES:
            resolved_name = basenet_name[1:]
            tracking = True
        spec = BASE_FACTORIES[resolved_name]
        for meta in head_metas:
            meta.base_stride = spec.stride
            meta.upsample_stride = max(meta.upsample_stride, self.upsample_stride)
        basenet = spec.build(norm=self.norm, dtype=self.compute_dtype)
        head_nets = [
            CompositeField4(meta=meta, in_features=spec.out_features,
                            dropout_rate=self.head_dropout,
                            dtype=self.compute_dtype,
                            name=f'head_{meta.dataset}_{meta.name}')
            for meta in head_metas
        ]
        if tracking:
            module = TrackingShell(
                basenet=basenet, head_nets=head_nets,
                head_paired=tuple(isinstance(m, headmeta_mod.Tcaf)
                                  for m in head_metas))
            return TrackingModel(module, head_metas, base_stride=spec.stride,
                                 basenet_name=basenet_name)
        module = Shell(basenet=basenet, head_nets=head_nets,
                       cross_talk=self.cross_talk)
        return Model(module, head_metas, base_stride=spec.stride,
                     basenet_name=basenet_name)

    def from_scratch(self, basenet_name: str,
                     head_metas: Sequence[headmeta_mod.Base]) -> Model:
        LOG.info('building fresh model: basenet=%s heads=%s', basenet_name,
                 [m.name for m in head_metas])
        return self.build_module(basenet_name, head_metas)

    def from_checkpoint(self, checkpoint: str) -> Model:
        path = local_checkpoint_path(checkpoint)
        if path is None:
            raise FileNotFoundError(
                f'checkpoint {checkpoint!r} not found (CHECKPOINT_DIR='
                f'{CHECKPOINT_DIR})')
        header, variables = checkpoint_mod.load(path)
        model = self.build_module(header['basenet'], header['head_metas'])
        model.variables = jax.tree.map(jnp.asarray, variables)
        model.epoch = header.get('epoch', 0)
        LOG.info('loaded checkpoint %s (epoch %d)', path, model.epoch)
        return model

    @staticmethod
    def _heads_match(loaded: Sequence[headmeta_mod.Base],
                     wanted: Sequence[headmeta_mod.Base]) -> bool:
        loaded_ids = [(type(m).__name__, m.dataset, m.name) for m in loaded]
        wanted_ids = [(type(m).__name__, m.dataset, m.name) for m in wanted]
        return loaded_ids == wanted_ids

    def transfer(self, loaded: Model,
                 head_metas: Sequence[headmeta_mod.Base],
                 rng: Optional[jax.Array] = None) -> Model:
        """Graft a loaded model's weights onto a model with new head metas.

        The backbone always transfers; a head transfers when a loaded head
        has the same ``meta.name`` and identical parameter shapes (dataset
        may differ — e.g. cocokp -> cocokpst); everything else initializes
        fresh.  Epoch resets to 0 (this starts a new training).
        """
        fresh = self.build_module(loaded.basenet_name, head_metas)
        fresh.init(rng if rng is not None else jax.random.key(0))

        # flax names list-held heads positionally (head_nets_<i>); align
        # them through the metas: exact (dataset, name) match first, then
        # by name — FIRST occurrence wins so a multi-dataset checkpoint
        # doesn't silently graft a later dataset's same-named head
        old_exact = {}
        old_by_name = {}
        for j, m in enumerate(loaded.head_metas):
            old_exact.setdefault((m.dataset, m.name), f'head_nets_{j}')
            old_by_name.setdefault(m.name, f'head_nets_{j}')
        name_counts = {}
        for m in loaded.head_metas:
            name_counts[m.name] = name_counts.get(m.name, 0) + 1
        ambiguous = {n for n, c in name_counts.items() if c > 1}
        new_meta = {f'head_nets_{i}': m for i, m in enumerate(head_metas)}

        def shapes(tree):
            return jax.tree.map(lambda x: x.shape, tree)

        transferred, fresh_keys = [], []
        variables = {}
        for coll, fresh_coll in fresh.variables.items():
            old_coll = loaded.variables.get(coll, {})
            out = dict(fresh_coll)
            for key in fresh_coll:
                if key in new_meta:                       # a head module
                    meta = new_meta[key]
                    src = old_exact.get((meta.dataset, meta.name))
                    if src is None:
                        src = old_by_name.get(meta.name)
                        if src is not None and meta.name in ambiguous \
                                and coll == 'params':
                            LOG.warning(
                                'head %r matches several checkpoint heads; '
                                'transferring the first (%s)',
                                meta.name, src)
                    label = f'{key} ({meta.name})'
                else:                                     # backbone etc.
                    src = key if key in old_coll else None
                    label = key
                if src in old_coll \
                        and shapes(old_coll[src]) == shapes(fresh_coll[key]):
                    out[key] = old_coll[src]
                    if coll == 'params':
                        transferred.append(label)
                elif coll == 'params':
                    fresh_keys.append(label)
            variables[coll] = out
        fresh.variables = variables
        fresh.epoch = 0
        # WARNING, not info: when this happens at eval/predict time it
        # means scoring with randomly-initialized heads — the user must see
        # it (the reference warned on head mismatch, network/factory.py)
        log = LOG.warning if fresh_keys else LOG.info
        log('transfer learning: %s from checkpoint; FRESH (random) '
            'weights: %s', transferred, fresh_keys)
        return fresh
