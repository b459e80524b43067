"""Guide 8 — TPU performance playbook.

The reference documents performance as a table of checkpoints
(``guide/performance.ipynb``); on TPU the interesting story is *how* the
pipeline maps onto the hardware.  This guide demonstrates, on whatever
backend is available (CI forces CPU), the three techniques that set the
round-3 numbers (BENCH_r03: 215+ img/s e2e at 641px on one v5e chip,
decode ~1 ms/img device-side):

1. **Fused routing** (``models/fused_shufflenet.py``): ShuffleNetV2's
   split/concat/channel_shuffle are lane-axis relayouts; folded into the
   1x1 convolutions as 0/1 weight blocks they ride the MXU instead of
   round-tripping HBM.  ``Model.apply_fast`` picks the plan
   automatically; the parameter tree is unchanged.
2. **Static work tables** (``ops/growth.py``): the decoder never builds
   per-image data structures — out-edge/in-edge tables are numpy
   constants baked into the compiled program, so each growth round is a
   dense gather + argmax on shapes independent of image content.
3. **Scan-chain benchmarking** (``bench.py``): on a tunneled TPU, only
   device-resident ``lax.scan`` chains with data-dependent carries give
   honest numbers (RTT amortized, memoization impossible).

Run: ``python guide/08_performance.py``.
"""

import os
import time

os.environ.setdefault('XLA_FLAGS',
                      '--xla_force_host_platform_device_count=1')

import jax
import jax.numpy as jnp
import numpy as np

from openpifpaf_tpu import headmeta, models, ops
from openpifpaf_tpu.plugins.coco import constants

# --- 1. build the flagship model; apply_fast picks the fused plan -----------
cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                   sigmas=constants.COCO_PERSON_SIGMAS,
                   skeleton=constants.COCO_PERSON_SKELETON)
factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
model = factory.from_scratch('shufflenetv2k16', [cif, caf])
model.init(jax.random.key(0), input_hw=(65, 65))

from openpifpaf_tpu.models import fused_shufflenet  # noqa: E402

print('fused plan supported:', fused_shufflenet.supports(model.module.basenet))

# --- 2. one jitted predict step: fused forward + full decode ----------------
image_hw = (161, 161)
config = ops.CifCafConfig(stride=16, image_hw=image_hw)
decode = ops.make_batch_decoder(cif_meta=cif, caf_meta=caf, config=config)


@jax.jit
def predict(variables, images):
    fields = model.apply_fast(variables, images)
    return decode(fields[0], fields[1])


rng = np.random.default_rng(0)
images = rng.normal(size=(2, *image_hw, 3)).astype(np.float32)
decoded = predict(model.variables, images)
print('decoded poses tensor:', decoded.xyv.shape,
      'valid:', int(decoded.valid.sum()))

# --- 3. scan-chain timing: the only honest protocol over a tunnel -----------
n_inner = 4


@jax.jit
def chain(stacked, carry):
    def body(c, x):
        d = predict(model.variables, x + c * 1e-6)
        return d.scores.sum().astype(jnp.float32), ()
    carry, _ = jax.lax.scan(body, carry, stacked)
    return carry


stacked = jnp.stack([jnp.asarray(images)] * n_inner)
carry = chain(stacked, jnp.zeros((), jnp.float32))   # compile + warmup
jax.block_until_ready(carry)
start = time.perf_counter()
carry = chain(stacked, carry)
_ = float(carry)                                      # hard sync
elapsed = (time.perf_counter() - start) / n_inner / images.shape[0]
print(f'per-image predict (incl. amortized host overhead): '
      f'{elapsed * 1e3:.2f} ms on {jax.devices()[0].device_kind}')
print('for production numbers see bench.py / PERF.md / BENCH_r*.json')
print('OK')
