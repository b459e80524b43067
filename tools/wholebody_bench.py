"""WholeBody (133 kp / 129 edges) decode stress benchmark (VERDICT r2 #5).

BASELINE config 4: the decoder-kernel stress test — growth's (P, Q, C)
tensors are ~7x COCO's.  Measures fused decode ms/img at the 641px bench
shape with the scan-chain protocol, reports budget-overflow counters at
production budgets, and appends a PERF.md-style row to stdout.

Run from the repo root on the TPU:  python tools/wholebody_bench.py
"""

import dataclasses
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

_T0 = time.perf_counter()
B = 8
IMAGE_HW = (641, 641)


def log(msg):
    print(f'[wb +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def scan_time(fn, stacked, n_inner=8, n_calls=5):
    """fn(x, scalar_carry) -> (scalar, aux_tree).  Returns (median s/iter,
    aux of the last call) with one compiled program total."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(stacked, carry):
        def body(c, x):
            c2, aux = fn(x, c)
            return c2, aux
        carry, auxs = jax.lax.scan(body, carry, stacked)
        return carry, jax.tree.map(lambda a: a[-1], auxs)

    carry = jnp.zeros((), jnp.float32)
    carry, aux = chain(stacked, carry)
    jax.block_until_ready((carry, aux))
    times = []
    for _ in range(n_calls):
        start = time.perf_counter()
        carry, aux = chain(stacked, carry)
        c = float(carry)
        times.append((time.perf_counter() - start) / n_inner)
        assert np.isfinite(c)
    return statistics.median(times), aux


def main():
    import jax
    import jax.numpy as jnp

    from openpifpaf_tpu import headmeta, models
    from openpifpaf_tpu.ops import pipeline
    from openpifpaf_tpu.plugins.wholebody import constants as wb

    cif = headmeta.Cif('cif', 'wholebody', keypoints=wb.KEYPOINTS,
                       sigmas=wb.SIGMAS,
                       score_weights=[1.0] * len(wb.KEYPOINTS))
    caf = headmeta.Caf('caf', 'wholebody', keypoints=wb.KEYPOINTS,
                       sigmas=wb.SIGMAS, skeleton=wb.SKELETON)
    factory = models.Factory(base_name='shufflenetv2k16', bf16=True)
    model = factory.from_scratch('shufflenetv2k16', [cif, caf])
    model.init(jax.random.key(0), input_hw=(65, 65))
    variables = model.variables

    log('forward: staging wholebody fields (untrained = dense worst case)')
    fwd = jax.jit(lambda v, x: model.apply_fast(v, x))
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.normal(size=(B, *IMAGE_HW, 3)).astype(np.float32))
    fields = jax.block_until_ready(fwd(variables, imgs))
    cif_f, caf_f = fields[0], fields[1]

    # production budgets (decoder/cifcaf.py defaults scale with the
    # keypoint count: the wholebody plugin ups max_seeds/candidates)
    config = pipeline.CifCafConfig(stride=16, image_hw=IMAGE_HW)
    config = dataclasses.replace(
        config,
        seeds=dataclasses.replace(config.seeds, max_seeds=1024),
        caf=dataclasses.replace(config.caf, max_candidates=256),
    )

    def decode_one(x):
        cf, af = x
        return pipeline.decode_cifcaf_single(
            cf, af, cif_meta=cif, caf_meta=caf, config=config)

    def sum_leaves(tree):
        leaves = [l for l in jax.tree.leaves(tree)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(l.sum().astype(jnp.float32) for l in leaves) * 1e-9

    vdecode = jax.vmap(decode_one)

    def step(x, c):
        cf, af = x
        decoded = vdecode((cf + c * 1e-6, af))
        counters = jnp.stack([
            decoded.n_dropped_cif.sum(), decoded.n_dropped_caf.sum(),
            decoded.n_dropped_poses.sum(),
            decoded.valid.sum().astype(jnp.int32)])
        return sum_leaves(decoded), counters

    stacked = jax.tree.map(lambda a: jnp.stack([a] * 8), (cif_f, caf_f))
    log('decode: compile+time (133 kp / 129 edges)...')
    t, counter_vec = scan_time(step, stacked)

    # noop floor for the RTT correction
    tiny = jnp.zeros((8, 4, 4), jnp.float32)
    t0, _ = scan_time(
        lambda x, c: ((x[0, 0] + c).sum() * 1.000001, jnp.zeros(4)), tiny)

    cvec = np.asarray(counter_vec)
    counters = {
        'n_dropped_cif': int(cvec[0]),
        'n_dropped_caf': int(cvec[1]),
        'n_dropped_poses': int(cvec[2]),
        'n_poses': int(cvec[3]),
    }
    out = {
        'metric': 'wholebody_decode_ms_per_image_641px',
        'raw_ms_per_img': round(t / B * 1e3, 3),
        'floor_ms_per_img': round(t0 / B * 1e3, 3),
        'ms_per_img': round((t - t0) / B * 1e3, 3),
        'images_per_s_decode': round(B / (t - t0), 1),
        'batch': B,
        'budgets': {'max_seeds': 1024, 'max_candidates': 256,
                    'max_poses': config.growth.max_poses},
        'counters_batch8_untrained': counters,
    }
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
