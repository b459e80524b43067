"""Batch scaling of the fused forward + decode (post-optimization).

Earlier (pre-fusion) batch 16 showed no gain — the program was pure
HBM-bandwidth bound.  After the merged-conv forward and the decode fast
path, per-kernel fixed costs are a bigger fraction; re-test whether a
larger batch amortizes them.  Run from the repo root on the TPU.
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

_T0 = time.perf_counter()
IMAGE_HW = (641, 641)


def log(msg):
    print(f'[b +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def scan_time(fn, stacked, n_inner=8, n_calls=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(stacked, carry):
        def body(c, x):
            return fn(x, c), ()
        carry, _ = jax.lax.scan(body, carry, stacked)
        return carry

    carry = jnp.zeros((), jnp.float32)
    carry = chain(stacked, carry)
    jax.block_until_ready(carry)
    times = []
    for _ in range(n_calls):
        start = time.perf_counter()
        carry = chain(stacked, carry)
        c = float(carry)
        times.append((time.perf_counter() - start) / n_inner)
        assert np.isfinite(c)
    return statistics.median(times)


def main():
    import jax
    import jax.numpy as jnp

    from openpifpaf_tpu import headmeta, models, ops
    from openpifpaf_tpu.plugins.coco import constants

    cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name='shufflenetv2k16', bf16=True)
    model = factory.from_scratch('shufflenetv2k16', [cif, caf])
    model.init(jax.random.key(0), input_hw=(65, 65))
    variables = model.variables
    config = ops.CifCafConfig(stride=16, image_hw=IMAGE_HW)
    decode = ops.make_batch_decoder(cif_meta=cif, caf_meta=caf,
                                    config=config)
    rng = np.random.default_rng(0)

    for b in (8, 16, 24):
        imgs = rng.normal(size=(8, b, *IMAGE_HW, 3)).astype(np.float32)
        stacked = jax.device_put(imgs)

        def predict(x, c):
            fields = model.apply_fast(variables, x + c * 1e-6)
            decoded = decode(fields[0], fields[1])
            return (decoded.scores.sum() + decoded.xyv.sum() * 1e-3
                    ).astype(jnp.float32)

        log(f'batch {b}: compile+time e2e...')
        t = scan_time(predict, stacked)
        print(json.dumps({'batch': b,
                          'ms_per_img_e2e': round(t / b * 1e3, 3),
                          'img_per_s': round(b / t, 1)}), flush=True)


if __name__ == '__main__':
    main()
