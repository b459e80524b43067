"""Benchmark: end-to-end forward + on-device decode throughput.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.

Measures images/s for the full predict step (ShuffleNetV2K-16 in bfloat16 +
batched on-device CifCaf decode) at the reference's standard 641px eval
resolution, on whatever accelerator jax.devices() provides.

Baseline (BASELINE.md): the reference end-to-end pipeline runs at
~25-50 ms/image (GPU forward + C++ CPU decode) => ~30 images/s; the decoder
alone is 10-20 ms (~67 fps).  North star: >=10x the CPU decoder's
throughput per chip on the end-to-end path.
"""

import json
import time

import numpy as np

BASELINE_E2E_FPS = 30.0  # reference total ~33ms/img (BASELINE.md, UNVERIFIED)


def main():
    import jax

    from openpifpaf_tpu import models, ops
    from openpifpaf_tpu import headmeta
    from openpifpaf_tpu.plugins.coco import constants

    batch = 8
    image_hw = (641, 641)

    cif = headmeta.Cif('cif', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name='shufflenetv2k16', bf16=True)
    model = factory.from_scratch('shufflenetv2k16', [cif, caf])
    model.init(jax.random.key(0), input_hw=(65, 65))

    config = ops.CifCafConfig(stride=16, image_hw=image_hw)
    decode = ops.make_batch_decoder(cif_meta=cif, caf_meta=caf, config=config)

    @jax.jit
    def predict_step(variables, images):
        fields = model.module.apply(variables, images, train=False)
        return decode(fields[0], fields[1])

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.normal(size=(batch, *image_hw, 3)).astype(np.float32))
    variables = model.variables

    # warmup / compile
    out = predict_step(variables, images)
    jax.block_until_ready(out)

    n_iters = 10
    start = time.perf_counter()
    for _ in range(n_iters):
        out = predict_step(variables, images)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start

    fps = batch * n_iters / elapsed
    print(json.dumps({
        'metric': 'e2e_forward_decode_fps_641px_sn2k16',
        'value': round(fps, 2),
        'unit': 'images/s',
        'vs_baseline': round(fps / BASELINE_E2E_FPS, 2),
    }))


if __name__ == '__main__':
    main()
