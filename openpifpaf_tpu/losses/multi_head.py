"""MultiHeadLoss: weighted sum over all heads' loss components.

Reference parity: ``src/openpifpaf/network/losses/multi_head.py`` —
weighted sum with ``--lambdas`` (``:~60``); optional task-uncertainty
auto-tuning (Kendall et al. sigma weighting, ``--auto-tune-mtl``, ``:~80``)
is exposed as learnable log-sigmas managed by the trainer.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp

from .composite import CompositeLoss


class MultiHeadLoss:
    def __init__(self, losses: Sequence[CompositeLoss],
                 lambdas: Optional[Sequence[float]] = None):
        self.losses = list(losses)
        n = sum(l.n_components for l in self.losses)
        if lambdas is None:
            lambdas = [1.0] * n
        assert len(lambdas) == n, \
            f'need {n} lambdas, got {len(lambdas)}'
        self.lambdas = list(lambdas)

    @property
    def field_names(self) -> List[str]:
        return [name for l in self.losses for name in l.field_names]

    def __call__(self, fields: Sequence[jnp.ndarray],
                 targets: Sequence[dict],
                 log_sigmas: Optional[jnp.ndarray] = None):
        """Returns (total_loss, component_losses list).

        ``log_sigmas``: optional (n_components,) learnable task-uncertainty
        parameters; when given, each component i contributes
        ``exp(-2 s_i) * l_i + s_i`` (Kendall MTL weighting).
        """
        comps = []
        for loss_fn, field, target in zip(self.losses, fields, targets):
            if target is None:
                # multi-dataset training: this batch carries no targets for
                # this head (datasets/multimodule.py pads with None)
                comps.extend([jnp.zeros(())] * loss_fn.n_components)
            else:
                comps.extend(loss_fn(field, target))

        weighted = [lam * c for lam, c in zip(self.lambdas, comps)]
        if log_sigmas is not None:
            weighted = [jnp.exp(-2.0 * s) * wl + s
                        for s, wl in zip(log_sigmas, weighted)]
        total = jnp.sum(jnp.stack(weighted))
        return total, comps
