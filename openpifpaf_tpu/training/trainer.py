"""Trainer: the jitted training loop.

Reference parity: ``src/openpifpaf/trainer.py`` — ``Trainer.loop()``
(``:~150``): per-batch forward/loss/backward, gradient clipping, optimizer
step, EMA of weights (``:~250``); per-epoch val pass and checkpoint write
(``:~300``); json-lines log (``:~200``).  Rank-0-only logging/writing.

TPU-first: the whole step (forward, loss, grads, psum over the data axis,
optimizer update, EMA) is ONE donated jit program over the global mesh;
gradients are averaged across devices by XLA from the sharding annotations
(no DDP wrapper, no bucketing).  EMA is a lerp fused into the same program.
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from .optimize import OptimizeFactory
from .. import debug_checks
from ..configurable import Configurable
from ..models import checkpoint as checkpoint_mod
from ..parallel import mesh as mesh_mod

LOG = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    log_sigmas: Any  # None unless --auto-tune-mtl


class Trainer(Configurable):
    epochs = 1
    ema_decay = 0.99          # reference --ema (update factor 0.01)
    checkpoint_interval = 1   # epochs between checkpoint files
    log_interval = 10         # batches between log lines
    val_interval = 1
    fix_batch_norm = False
    auto_tune_mtl = False
    remat = False             # rematerialize the forward in backward
    orbax = False             # also write Orbax train-state checkpoints

    @classmethod
    def cli(cls, parser: argparse.ArgumentParser) -> None:
        group = parser.add_argument_group('trainer')
        group.add_argument('--epochs', default=cls.epochs, type=int)
        group.add_argument('--ema', default=1.0 - cls.ema_decay, type=float,
                           help='EMA update factor (0 disables)')
        group.add_argument('--checkpoint-interval',
                           default=cls.checkpoint_interval, type=int)
        group.add_argument('--log-interval', default=cls.log_interval,
                           type=int)
        group.add_argument('--val-interval', default=cls.val_interval,
                           type=int)
        group.add_argument('--fix-batch-norm', default=cls.fix_batch_norm,
                           action='store_true',
                           help='freeze batch norm statistics')
        group.add_argument('--remat', default=cls.remat, action='store_true',
                           help='rematerialize the forward pass in the '
                                'backward (trade FLOPs for HBM, enables '
                                'larger batches)')
        group.add_argument('--orbax', default=cls.orbax, action='store_true',
                           help='write Orbax train-state checkpoints '
                                '(multi-host synchronized atomic commits)')

    @classmethod
    def configure(cls, args: argparse.Namespace) -> None:
        cls.epochs = args.epochs
        cls.ema_decay = 1.0 - args.ema
        cls.checkpoint_interval = args.checkpoint_interval
        cls.log_interval = args.log_interval
        cls.val_interval = args.val_interval
        cls.fix_batch_norm = args.fix_batch_norm
        cls.remat = args.remat
        cls.orbax = args.orbax

    # ------------------------------------------------------------------
    def __init__(self, model, loss_fn, optimize_factory: OptimizeFactory,
                 out: str, **kwargs):
        super().__init__(**kwargs)
        self.model = model
        self.loss_fn = loss_fn
        self.optimize_factory = optimize_factory
        self.out = out
        self.mesh = None  # built lazily from the first batch's size
        self.n_devices = jax.device_count()
        self.is_main = jax.process_index() == 0
        self._log_file = None
        self._train_step = None
        self._val_step = None
        self._schedule = None
        self._tx = None
        self._preempted = False

    def _install_preemption_handler(self) -> None:
        """SIGTERM -> finish the current epoch, checkpoint, exit cleanly.

        SURVEY.md §5.3: the reference has no preemption handling (recovery
        is manual restart from the last epoch checkpoint); preemptible TPU
        jobs get a grace period on eviction, so catching SIGTERM turns it
        into a clean resumable stop.
        """
        import signal

        def handler(signum, frame):  # pylint: disable=unused-argument
            LOG.warning('received signal %d: will checkpoint and stop at '
                        'the next epoch boundary', signum)
            self._preempted = True

        try:
            signal.signal(signal.SIGTERM, handler)
        except ValueError:  # pragma: no cover - non-main thread
            pass

    # -- state ----------------------------------------------------------
    def init_state(self, steps_per_epoch: int) -> TrainState:
        self._schedule = self.optimize_factory.schedule(
            steps_per_epoch=steps_per_epoch, total_epochs=self.epochs)
        self._tx = self.optimize_factory.optimizer(self._schedule)
        variables = self.model.variables
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        log_sigmas = (jnp.zeros((len(self.loss_fn.field_names),))
                      if self.auto_tune_mtl else None)
        opt_params = {'params': params}
        if log_sigmas is not None:
            opt_params['log_sigmas'] = log_sigmas
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self._tx.init(opt_params),
            # fresh buffers: params and ema_params must not alias (the
            # train step donates the whole state)
            ema_params=jax.tree.map(jnp.copy, params),
            log_sigmas=log_sigmas,
        )

    # -- jitted steps ---------------------------------------------------
    def _build_steps(self):
        model = self.model
        loss_fn = self.loss_fn
        tx = self._tx
        ema_decay = self.ema_decay
        fix_bn = self.fix_batch_norm

        from ..models import fused_shufflenet

        if (getattr(model, 'fused_train', True)
                and fused_shufflenet.supports_train(model, model.variables)):
            # folded-routing training plan: same math/gradients on the
            # canonical tree, batch-mode BN through the flax module
            # (exactness: tests/test_fused_shufflenet.py::TestTrainPlan)
            def apply_train(variables, images):
                return fused_shufflenet.shell_apply_train(
                    model, variables, images)
        else:
            def apply_train(variables, images):
                return model.apply(variables, images, train=True,
                                   mutable=['batch_stats'])

        def apply_eval(variables, images):
            return model.apply(variables, images, train=False)

        if self.remat:
            # trade forward recompute for activation memory; matmul outputs
            # are kept (cheap to store, expensive to recompute on MXU)
            policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            apply_train = jax.checkpoint(apply_train, policy=policy)
            apply_eval = jax.checkpoint(apply_eval, policy=policy)

        def loss_of(params, batch_stats, log_sigmas, images, targets, train):
            variables = {'params': params}
            if batch_stats:
                variables['batch_stats'] = batch_stats
            if train and batch_stats and not fix_bn:
                fields, mutated = apply_train(variables, images)
                new_stats = mutated['batch_stats']
            else:
                fields = apply_eval(variables, images)
                new_stats = batch_stats
            total, comps = loss_fn(fields, targets, log_sigmas=log_sigmas)
            # SURVEY §5.2 sanitizer substitute: traced only when enabled
            debug_checks.check_finite(total, 'non-finite training loss')
            return total, (jnp.stack(comps), new_stats)

        def train_step(state: TrainState, images, targets):
            def wrapped(opt_params):
                return loss_of(opt_params['params'], state.batch_stats,
                               opt_params.get('log_sigmas'), images,
                               targets, True)

            opt_params = {'params': state.params}
            if state.log_sigmas is not None:
                opt_params['log_sigmas'] = state.log_sigmas
            (total, (comps, new_stats)), grads = jax.value_and_grad(
                wrapped, has_aux=True)(opt_params)
            updates, new_opt_state = tx.update(grads, state.opt_state,
                                               opt_params)
            import optax
            new_opt_params = optax.apply_updates(opt_params, updates)
            new_params = new_opt_params['params']
            new_ema = jax.tree.map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, new_params)
            new_state = state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                ema_params=new_ema,
                log_sigmas=new_opt_params.get('log_sigmas'),
            )
            return new_state, total, comps

        def val_step(state: TrainState, images, targets):
            total, (comps, _) = loss_of(
                state.params, state.batch_stats, state.log_sigmas,
                images, targets, False)
            return total, comps

        self._train_step = debug_checks.checked_jit(
            train_step, donate_argnums=0)
        self._val_step = debug_checks.checked_jit(val_step)

    # -- logging --------------------------------------------------------
    def log_line(self, data: dict) -> None:
        if not self.is_main:
            return
        if self._log_file is None:
            self._log_file = open(self.out + '.log', 'a')
        self._log_file.write(json.dumps(data) + '\n')
        self._log_file.flush()

    # -- checkpointing --------------------------------------------------
    def write_checkpoint(self, state: TrainState, epoch: int,
                         final: bool = False) -> None:
        if not self.is_main:
            return
        variables = {'params': jax.tree.map(np.asarray, state.ema_params)}
        if state.batch_stats:
            variables['batch_stats'] = jax.tree.map(np.asarray,
                                                    state.batch_stats)
        name = f'{self.out}.epoch{epoch:03d}.npz'
        checkpoint_mod.save(
            name, variables=variables,
            head_metas=self.model.head_metas,
            basenet_name=self.model.basenet_name,
            base_stride=self.model.base_stride, epoch=epoch)
        latest = self.out + '.npz'
        checkpoint_mod.save(
            latest, variables=variables,
            head_metas=self.model.head_metas,
            basenet_name=self.model.basenet_name,
            base_stride=self.model.base_stride, epoch=epoch)
        # training copy (raw params) for resume
        train_vars = {'params': jax.tree.map(np.asarray, state.params),
                      'ema': jax.tree.map(np.asarray, state.ema_params)}
        if state.batch_stats:
            train_vars['batch_stats'] = jax.tree.map(np.asarray,
                                                     state.batch_stats)
        checkpoint_mod.save(
            self.out + '.train.npz', variables=train_vars,
            head_metas=self.model.head_metas,
            basenet_name=self.model.basenet_name,
            base_stride=self.model.base_stride, epoch=epoch)
        LOG.info('checkpoint written: %s', name)
        if self.orbax:
            self.write_orbax_checkpoint(state, epoch)

    def write_orbax_checkpoint(self, state: TrainState, epoch: int) -> None:
        """Full train-state checkpoint via Orbax (atomic, multi-host)."""
        import os

        import orbax.checkpoint as ocp

        path = os.path.abspath(f'{self.out}.orbax/epoch_{epoch:03d}')
        with ocp.StandardCheckpointer() as checkpointer:
            checkpointer.save(path, {
                'step': state.step,
                'params': state.params,
                'batch_stats': state.batch_stats,
                'ema_params': state.ema_params,
                'opt_state': state.opt_state,
            }, force=True)
        LOG.info('orbax checkpoint written: %s', path)

    def load_train_checkpoint(self, path: str, steps_per_epoch: int):
        header, variables = checkpoint_mod.load(path)
        state = self.init_state(steps_per_epoch)
        state = state.replace(
            params=jax.tree.map(jnp.asarray, variables['params']),
            ema_params=jax.tree.map(jnp.asarray, variables['ema']),
            batch_stats=jax.tree.map(jnp.asarray,
                                     variables.get('batch_stats', {})),
            step=jnp.asarray(header['epoch'] * steps_per_epoch, jnp.int32),
        )
        return state, header['epoch']

    # -- the loop -------------------------------------------------------
    def loop(self, train_loader, val_loader=None, *, start_epoch: int = 0,
             state: Optional[TrainState] = None):
        steps_per_epoch = len(train_loader)
        if state is None:
            state = self.init_state(steps_per_epoch)
        if self._tx is None:
            self.init_state(steps_per_epoch)  # build schedule/tx
        self._build_steps()
        self._install_preemption_handler()

        for epoch in range(start_epoch, self.epochs):
            if self._preempted:
                LOG.warning('preemption: checkpointing at epoch %d and '
                            'stopping', epoch)
                self.write_checkpoint(state, epoch)
                break
            state = self.train_epoch(state, train_loader, epoch,
                                     steps_per_epoch)
            if val_loader is not None and \
                    (epoch + 1) % self.val_interval == 0:
                self.val_epoch(state, val_loader, epoch)
            if ((epoch + 1) % self.checkpoint_interval == 0
                    or epoch + 1 == self.epochs):
                self.write_checkpoint(state, epoch + 1)
        return state

    def _ensure_mesh(self, local_batch: int) -> None:
        if self.mesh is not None:
            return
        n = self.n_devices
        global_batch = local_batch * jax.process_count()
        while n > 1 and global_batch % n != 0:
            n -= 1
        if n != self.n_devices:
            LOG.warning(
                'global batch %d not divisible by %d devices; using %d',
                global_batch, self.n_devices, n)
        self.mesh = mesh_mod.data_mesh(n_devices=n)

    def _place(self, images, targets):
        self._ensure_mesh(images.shape[0])
        images = mesh_mod.shard_batch(self.mesh, images)
        targets = mesh_mod.shard_batch(self.mesh, targets)
        return images, targets

    def train_epoch(self, state, loader, epoch: int, steps_per_epoch: int):
        epoch_start = time.perf_counter()
        last_log = epoch_start
        loss_acc = []
        for batch_i, (images, targets, _) in enumerate(loader):
            images, targets = self._place(images, targets)
            state, total, comps = self._train_step(state, images, targets)
            if (batch_i % self.log_interval == 0
                    or batch_i + 1 == steps_per_epoch):
                total = float(total)
                comps_list = [float(c) for c in np.asarray(comps)]
                now = time.perf_counter()
                step = epoch * steps_per_epoch + batch_i
                self.log_line({
                    'type': 'train', 'epoch': epoch, 'batch': batch_i,
                    'n_batches': steps_per_epoch,
                    'time': round(now - last_log, 3),
                    'lr': float(self._schedule(step)),
                    'loss': round(total, 6),
                    'head_losses': [round(c, 6) for c in comps_list],
                })
                last_log = now
                loss_acc.append(total)
                if not np.isfinite(total):
                    raise RuntimeError(f'loss is {total} at epoch {epoch} '
                                       f'batch {batch_i}')
        self.log_line({
            'type': 'train-epoch', 'epoch': epoch + 1,
            'loss': round(float(np.mean(loss_acc)), 6) if loss_acc else None,
            'time': round(time.perf_counter() - epoch_start, 1),
        })
        return state

    def val_epoch(self, state, loader, epoch: int):
        start = time.perf_counter()
        totals, comps_acc = [], []
        for images, targets, _ in loader:
            images, targets = self._place(images, targets)
            total, comps = self._val_step(state, images, targets)
            totals.append(float(total))
            comps_acc.append(np.asarray(comps))
        self.log_line({
            'type': 'val-epoch', 'epoch': epoch + 1,
            'loss': round(float(np.mean(totals)), 6) if totals else None,
            'head_losses': [round(float(c), 6)
                            for c in np.mean(comps_acc, axis=0)] if comps_acc
            else [],
            'time': round(time.perf_counter() - start, 1),
        })
