"""Guide 2 — Training with the Python API.

Mirrors the reference's ``guide/train.ipynb``: the same objects the
``train`` CLI assembles (datamodule -> model -> loss -> Trainer) driven
directly from Python.  The whole train step — forward, loss, grads,
optimizer update, EMA — is ONE donated jit program; the input pipeline
paints CIF/CAF targets on the host (C++ fast path) while the device runs.

Run: ``python guide/02_training_api.py``.
"""

import tempfile

import jax

from openpifpaf_tpu import datasets, losses, models
from openpifpaf_tpu import plugins  # noqa: F401  (registers datamodules)
from openpifpaf_tpu.plugins.toykp.datamodule import ToyKp
from openpifpaf_tpu.training import OptimizeFactory, Trainer

out = tempfile.mkdtemp(prefix='guide02_') + '/model'

# class-attribute configuration — exactly what the CLI flags mutate
ToyKp.n_images = 8
ToyKp.n_val_images = 4
ToyKp.image_size = 81
ToyKp.batch_size = 4
Trainer.epochs = 1
Trainer.log_interval = 1

datamodule = datasets.factory('toykp')

factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
model = factory.factory(head_metas=datamodule.head_metas,
                        rng=jax.random.key(0))
print('model:', model.basenet_name, f'{model.num_params():,} params')

loss_fn = losses.Factory().factory(model.head_metas)

trainer = Trainer(model, loss_fn, OptimizeFactory(), out)
trainer.loop(datamodule.train_loader(), datamodule.val_loader())

# checkpoints: {out}.npz (latest, EMA weights), {out}.epochNNN.npz,
# {out}.train.npz (optimizer state for --resume), {out}.log (json lines)
reloaded = models.Factory(checkpoint=out + '.npz').factory()
assert reloaded.epoch == 1
print('reloaded epoch', reloaded.epoch)
print('guide 02 OK')
