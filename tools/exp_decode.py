"""Round-3 decode-path experiments: per-stage scan-chain timing on TPU.

Times each decode stage as a device-resident chain (RTT amortized over 8
iterations, floor calibrated with a noop) and A/Bs the bf16 front-end
variants.  Run from the repo root on the tunneled TPU:

    python tools/exp_decode.py
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
B = 8
IMAGE_HW = (641, 641)


def log(msg):
    print(f'[dec +{time.perf_counter() - _T0:7.1f}s] {msg}',
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

    from openpifpaf_tpu import headmeta, models
    from openpifpaf_tpu.ops import (caf_scored, cif_hr, growth, pipeline,
                                    seeds)
    from openpifpaf_tpu.models.heads import split_fields
    from openpifpaf_tpu.plugins.coco import constants

    cif_meta = headmeta.Cif('cif', 'cocokp',
                            keypoints=constants.COCO_KEYPOINTS,
                            sigmas=constants.COCO_PERSON_SIGMAS,
                            score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf_meta = headmeta.Caf('caf', 'cocokp',
                            keypoints=constants.COCO_KEYPOINTS,
                            sigmas=constants.COCO_PERSON_SIGMAS,
                            skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name='shufflenetv2k16', bf16=True)
    model = factory.from_scratch('shufflenetv2k16', [cif_meta, caf_meta])
    model.init(jax.random.key(0), input_hw=(65, 65))
    variables = model.variables

    config = pipeline.CifCafConfig(stride=16, image_hw=IMAGE_HW)
    skeleton = np.asarray(caf_meta.skeleton, np.int32) - 1
    edges = growth.directed_edges(skeleton)

    # stage one batch of fields + intermediates
    log('staging fields...')
    fwd = jax.jit(lambda v, x: model.apply_fast(v, x))
    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.normal(size=(B, *IMAGE_HW, 3)).astype(np.float32))
    fields = jax.block_until_ready(fwd(variables, imgs))
    cif_f, caf_f = fields[0], fields[1]

    def coords(cifc):
        f, h, w = cifc.conf.shape
        jj = jnp.arange(h, dtype=jnp.float32)[None, :, None]
        ii = jnp.arange(w, dtype=jnp.float32)[None, None, :]
        x_px = (ii + cifc.vec[:, 0, 0]) * config.stride
        y_px = (jj + cifc.vec[:, 0, 1]) * config.stride
        scale_px = cifc.scale[:, 0] * config.stride
        return x_px, y_px, scale_px

    def cifhr_stage(cif_field):
        cifc = split_fields(cif_field, cif_meta)
        x_px, y_px, scale_px = coords(cifc)
        return cif_hr.accumulate(cifc.conf, x_px, y_px, scale_px,
                                 out_hw=config.hr_hw, config=config.cifhr)

    v_cifhr = jax.jit(jax.vmap(cifhr_stage))
    hr = jax.block_until_ready(v_cifhr(cif_f))

    def seeds_stage(x):
        cif_field, hr = x
        cifc = split_fields(cif_field, cif_meta)
        x_px, y_px, scale_px = coords(cifc)
        return seeds.select(cifc.conf, x_px, y_px, scale_px, hr,
                            hr_spacing=config.cifhr.spacing,
                            config=config.seeds)

    v_seeds = jax.jit(jax.vmap(seeds_stage))
    sds = jax.block_until_ready(v_seeds((cif_f, hr)))

    def caf_stage(x):
        caf_field, hr = x
        cafc = split_fields(caf_field, caf_meta)
        return caf_scored.score(cafc, hr, skeleton, stride=config.stride,
                                hr_spacing=config.cifhr.spacing,
                                config=config.caf)

    v_caf = jax.jit(jax.vmap(caf_stage))
    cands = jax.block_until_ready(v_caf((caf_f, hr)))

    def growth_full(x):
        sds, cands = x
        poses, placed, pose_valid, _, _, seed_f = growth.init_poses(
            sds, n_keypoints=17, config=config.growth)
        poses, placed = growth.grow(poses, placed, pose_valid, cands,
                                    edges, config.growth)
        return poses, placed, pose_valid, seed_f

    def growth_n(x, n_rounds):
        sds, cands = x
        poses, placed, pose_valid, _, _, seed_f = growth.init_poses(
            sds, n_keypoints=17, config=config.growth)
        poses, placed = growth.grow(poses, placed, pose_valid, cands,
                                    edges, config.growth, n_rounds=n_rounds)
        return poses, placed, pose_valid, seed_f

    def decode_stage(x):
        cif_field, caf_field = x
        return pipeline.decode_cifcaf_single(
            cif_field, caf_field, cif_meta=cif_meta, caf_meta=caf_meta,
            config=config)

    def sum_leaves(tree):
        leaves = [l for l in jax.tree.leaves(tree)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(l.sum().astype(jnp.float32) for l in leaves) * 1e-9

    results = []

    def run(name, single_fn, inputs, inject):
        vfn = jax.vmap(single_fn)

        def step(x, c):
            x = inject(x, c * 1e-6)
            return sum_leaves(vfn(x))

        stacked = jax.tree.map(
            lambda a: jnp.stack([a] * 8), inputs)
        log(f'{name}: compile+time...')
        t = scan_time(step, stacked)
        row = {'name': name, 'ms_per_img': round(t / B * 1e3, 4)}
        results.append(row)
        print(json.dumps(row), flush=True)

    def inj_first(x, d):
        return (x[0] + d, *x[1:]) if isinstance(x, tuple) else x + d

    def inj_seeds(x, d):
        sds, cands = x
        return sds._replace(v=sds.v + d), cands

    # noop floor
    tiny = jnp.zeros((8, 4, 4), jnp.float32)
    t0 = scan_time(lambda x, c: (x[0, 0] + c).sum() * 1.000001, tiny)
    print(json.dumps({'name': 'noop', 'ms_per_iter': round(t0 * 1e3, 3)}),
          flush=True)

    run('cifhr', cifhr_stage, cif_f, inj_first)
    run('seeds', seeds_stage, (cif_f, hr), inj_first)
    run('caf_scored', caf_stage, (caf_f, hr), inj_first)
    run('growth', growth_full, (sds, cands), inj_seeds)
    run('growth_0rounds', lambda x: growth_n(x, 0), (sds, cands),
        inj_seeds)
    run('growth_4rounds', lambda x: growth_n(x, 4), (sds, cands),
        inj_seeds)
    run('decode_full', decode_stage, (cif_f, caf_f), inj_first)

    print(json.dumps({'all': results}))


if __name__ == '__main__':
    main()
