"""Shell: backbone + head networks, plus the non-linen Model wrapper.

Reference parity: ``src/openpifpaf/network/nets.py:~20`` — ``Shell`` wraps a
base network and a list of head networks; its forward returns the list of
head field tensors.  TPU-first: ``Shell`` is a pure flax module; parameters
live outside the module in a pytree (``variables``), so the same module
works under ``jit`` / ``pjit`` / ``shard_map`` without translation.
``Model`` is the stateful convenience wrapper used by CLIs.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import headmeta as headmeta_mod


class Shell(nn.Module):
    basenet: nn.Module
    head_nets: Sequence[nn.Module]
    cross_talk: float = 0.0  # reference nets.py:~120 CrossTalk augmentation

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        if train and self.cross_talk > 0.0:
            # mix in a rolled copy of the batch (regularizes against
            # batch-position-dependent features; reference CrossTalk)
            x = x + self.cross_talk * jnp.roll(x, 1, axis=0)
        features = self.basenet(x, train)
        return [head(features, train) for head in self.head_nets]


class Model:
    """Bundles a Shell module with its variables and head metadata.

    This is the object CLIs and the Predictor hold on to.  All jitted code
    paths receive ``(module.apply, variables)`` explicitly and stay
    functional.
    """

    def __init__(self, module: Shell, head_metas: Sequence[headmeta_mod.Base],
                 *, base_stride: int, basenet_name: str = '',
                 variables: Any = None):
        self.module = module
        self.head_metas = list(head_metas)
        self.base_stride = base_stride
        self.basenet_name = basenet_name
        self.variables = variables
        self.epoch = 0

        for i, meta in enumerate(self.head_metas):
            meta.head_index = i
            meta.base_stride = base_stride

    def init(self, rng: jax.Array, input_hw=(81, 81)) -> Any:
        """Initialize variables with a dummy NHWC batch."""
        dummy = jnp.zeros((1, input_hw[0], input_hw[1], 3), jnp.float32)
        self.variables = self.module.init(rng, dummy, train=False)
        return self.variables

    @property
    def params(self):
        return self.variables['params']

    # fused execution plans (models/fused_shufflenet.py); set the class
    # attributes to False to revert to the baseline flax graph
    fused_inference = True
    fused_train = True

    def apply(self, variables, x, train: bool = False, mutable=False,
              rngs=None):
        return self.module.apply(variables, x, train=train, mutable=mutable,
                                 rngs=rngs)

    def apply_fast(self, variables, x) -> List[jnp.ndarray]:
        """Inference forward through the fastest supported execution plan.

        Same math as ``apply(train=False)``; ShuffleNetV2K backbones take
        the folded-routing plan (``fused_shufflenet.py``, measured ~1.9x
        on stage shapes), everything else falls back to the flax graph.
        """
        from . import fused_shufflenet  # local: avoid import cycle

        if (self.fused_inference
                and fused_shufflenet.supports(self.module.basenet)
                and 'batch_stats' in variables):
            return fused_shufflenet.shell_apply(self, variables, x)
        return self.module.apply(variables, x, train=False)

    def __call__(self, x, train: bool = False):
        """Eager convenience forward with stored variables."""
        return self.module.apply(self.variables, x, train=train)

    def num_params(self) -> int:
        return sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(self.variables))
