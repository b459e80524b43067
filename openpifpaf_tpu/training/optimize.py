"""Optimizer and LR schedule factories (optax).

Reference parity: ``src/openpifpaf/optimize.py:~30`` — SGD (nesterov
default) / Adam / AMSGrad, LR warm-up (``--lr-warm-up-epochs``), multi-step
decay (``--lr-decay`` epochs + factor) and optional cosine annealing.
"""

from __future__ import annotations

import argparse
from typing import Callable, List, Optional

import optax


class OptimizeFactory:
    lr = 1e-3
    momentum = 0.95
    beta2 = 0.999
    adam_eps = 1e-6
    nesterov = True
    weight_decay = 0.0
    adam = False
    amsgrad = False

    lr_warm_up_start_epoch = 0
    lr_warm_up_epochs = 1
    lr_warm_up_factor = 1e-3
    lr_decay: List[float] = []
    lr_decay_factor = 0.1
    lr_decay_epochs = 1.0
    cosine = False

    clip_grad_norm = 0.0
    clip_grad_value = 0.0

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('optimizer')
        group.add_argument('--lr', type=float, default=cls.lr,
                           help='learning rate')
        group.add_argument('--momentum', type=float, default=cls.momentum,
                           help='SGD momentum, beta1 in Adam')
        group.add_argument('--beta2', type=float, default=cls.beta2)
        group.add_argument('--adam-eps', type=float, default=cls.adam_eps)
        group.add_argument('--no-nesterov', dest='nesterov',
                           default=True, action='store_false')
        group.add_argument('--weight-decay', type=float,
                           default=cls.weight_decay)
        group.add_argument('--adam', default=False, action='store_true')
        group.add_argument('--amsgrad', default=False, action='store_true')

        group = parser.add_argument_group('learning rate schedule')
        group.add_argument('--lr-warm-up-start-epoch', type=float,
                           default=cls.lr_warm_up_start_epoch)
        group.add_argument('--lr-warm-up-epochs', type=float,
                           default=cls.lr_warm_up_epochs)
        group.add_argument('--lr-warm-up-factor', type=float,
                           default=cls.lr_warm_up_factor)
        group.add_argument('--lr-decay', type=float, nargs='+',
                           default=cls.lr_decay,
                           help='epochs at which to decay the lr')
        group.add_argument('--lr-decay-factor', type=float,
                           default=cls.lr_decay_factor)
        group.add_argument('--lr-decay-epochs', type=float,
                           default=cls.lr_decay_epochs,
                           help='length of each decay ramp in epochs')
        group.add_argument('--cosine', default=cls.cosine, action='store_true',
                           help='cosine annealing after warm-up')
        group.add_argument('--clip-grad-norm', type=float,
                           default=cls.clip_grad_norm)
        group.add_argument('--clip-grad-value', type=float,
                           default=cls.clip_grad_value)

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        for key in ('lr', 'momentum', 'beta2', 'adam_eps', 'nesterov',
                    'weight_decay', 'adam', 'amsgrad',
                    'lr_warm_up_start_epoch', 'lr_warm_up_epochs',
                    'lr_warm_up_factor', 'lr_decay', 'lr_decay_factor',
                    'lr_decay_epochs', 'cosine', 'clip_grad_norm',
                    'clip_grad_value'):
            setattr(cls, key, getattr(args, key))

    # ------------------------------------------------------------------
    def schedule(self, *, steps_per_epoch: int,
                 total_epochs: Optional[int] = None) -> Callable[[int], float]:
        """Build the per-step LR schedule (warm-up + multistep or cosine)."""
        warm_start = int(self.lr_warm_up_start_epoch * steps_per_epoch)
        warm_steps = max(1, int(self.lr_warm_up_epochs * steps_per_epoch))

        def lr_at(step):
            import jax.numpy as jnp
            step = jnp.asarray(step, jnp.float32)
            lam = jnp.clip((step - warm_start) / warm_steps, 0.0, 1.0)
            # exponential ramp from warm_up_factor to 1 (reference ramp)
            warm = self.lr_warm_up_factor ** (1.0 - lam)
            decay = jnp.asarray(1.0, jnp.float32)
            for decay_epoch in self.lr_decay:
                d_start = decay_epoch * steps_per_epoch
                d_len = max(1.0, self.lr_decay_epochs * steps_per_epoch)
                prog = jnp.clip((step - d_start) / d_len, 0.0, 1.0)
                decay = decay * self.lr_decay_factor ** prog
            if self.cosine and total_epochs:
                total = total_epochs * steps_per_epoch
                prog = jnp.clip((step - warm_start - warm_steps)
                                / max(1, total - warm_start - warm_steps),
                                0.0, 1.0)
                decay = decay * 0.5 * (1.0 + jnp.cos(jnp.pi * prog))
            return self.lr * warm * decay

        return lr_at

    def optimizer(self, schedule: Callable[[int], float]):
        chain = []
        if self.clip_grad_norm > 0:
            chain.append(optax.clip_by_global_norm(self.clip_grad_norm))
        if self.clip_grad_value > 0:
            chain.append(optax.clip(self.clip_grad_value))
        if self.adam or self.amsgrad:
            opt = optax.amsgrad if self.amsgrad else optax.adam
            chain.append(opt(learning_rate=schedule, b1=self.momentum,
                             b2=self.beta2, eps=self.adam_eps))
        else:
            chain.append(optax.sgd(learning_rate=schedule,
                                   momentum=self.momentum,
                                   nesterov=self.nesterov))
        if self.weight_decay > 0:
            chain.insert(-1, optax.add_decayed_weights(self.weight_decay))
        return optax.chain(*chain)
