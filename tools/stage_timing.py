"""Per-stage decode timing + roofline on the real TPU (VERDICT r1 #4/#7).

Times every decode stage as its own jitted batched program at the bench
shape (batch 8, 641px, sn2k16 / cocokp) with the same anti-memoization
methodology as bench.py (distinct staged inputs, data-dependent carry,
per-iteration host readback), pulls XLA cost analysis (FLOPs + bytes)
per stage, and reports each stage's distance from the hardware roofline:

    bound = max(flops / peak_flops, bytes / hbm_bandwidth)
    speed_of_light_pct = bound / measured

Writes PERF.md and prints one JSON line.  Run from the repo root on the
tunneled TPU (no env overrides); ~5-10 min:

    python tools/stage_timing.py [--out PERF.md]
"""

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

BATCH = 8
IMAGE_HW = (641, 641)
N_STAGED = 4
N_ITERS = 12

# v5e public spec: 197 TFLOP/s bf16 MXU; f32 ops run on the VPU/MXU at
# roughly 1/4 of that; HBM ~819 GB/s.  Used only to bound, not to claim.
PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32 = 49e12
HBM_BW = 819e9

_T0 = time.perf_counter()


def log(msg):
    print(f'[stage +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def chained_time(step, inputs_list):
    import jax

    carry = jax.numpy.zeros((), jax.numpy.float32)
    out, carry = step(inputs_list[0], carry)
    jax.block_until_ready((out, carry))
    times = []
    for i in range(N_ITERS):
        x = inputs_list[i % len(inputs_list)]
        start = time.perf_counter()
        out, carry = step(x, carry)
        c = float(carry)
        times.append(time.perf_counter() - start)
        assert np.isfinite(c)
    return statistics.median(times)


def cost_of(compiled):
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    cost = cost or {}
    return (float(cost.get('flops', 0.0)),
            float(cost.get('bytes accessed', 0.0)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default='PERF.md')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from openpifpaf_tpu import headmeta, models
    from openpifpaf_tpu.ops import (caf_scored, cif_hr, growth, nms,
                                    pipeline, seeds)
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
    score_weights = np.asarray(constants.COCO_PERSON_SCORE_WEIGHTS,
                               np.float32)

    # ---- single-image stage functions (vmapped + jitted below) ----
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

    def seeds_stage(operands):
        cif_field, hr = operands
        cifc = split_fields(cif_field, cif_meta)
        x_px, y_px, scale_px = coords(cifc)
        return seeds.select(cifc.conf, x_px, y_px, scale_px, hr,
                            hr_spacing=config.cifhr.spacing,
                            config=config.seeds)

    def caf_stage(operands):
        caf_field, hr = operands
        cafc = split_fields(caf_field, caf_meta)
        return caf_scored.score(cafc, hr, skeleton, stride=config.stride,
                                hr_spacing=config.cifhr.spacing,
                                config=config.caf)

    def growth_stage(operands):
        sds, cands = operands
        poses, placed, pose_valid, _, _, seed_f = growth.init_poses(
            sds, n_keypoints=17, config=config.growth)
        poses, placed = growth.grow(poses, placed, pose_valid, cands,
                                    edges, config.growth)
        return poses, placed, pose_valid, seed_f

    def nms_stage(operands):
        (poses, placed, pose_valid, seed_f), scale_px = operands
        return pipeline.finalize_poses(poses, placed, pose_valid, scale_px,
                                       score_weights=score_weights,
                                       config=config, seed_f=seed_f)

    def decode_stage(operands):
        cif_field, caf_field = operands
        return pipeline.decode_cifcaf_single(
            cif_field, caf_field, cif_meta=cif_meta, caf_meta=caf_meta,
            config=config)

    def scale_px_of(cif_field):
        cifc = split_fields(cif_field, cif_meta)
        return coords(cifc)[2]

    def carried(vfn, inject, extract):
        """Wrap a vmapped stage with the data-dependent carry protocol."""
        def step(x, carry):
            x = inject(x, carry * 1e-6)
            out = vfn(x)
            return out, extract(out)
        return jax.jit(step)

    def sum_leaves(tree):
        leaves = [l for l in jax.tree.leaves(tree)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(l.sum().astype(jnp.float32) for l in leaves) * 1e-9

    # ---- stage model forward + intermediates ----
    log('forward + staging intermediates...')
    forward = jax.jit(lambda v, x: model.module.apply(v, x, train=False))
    rng = np.random.default_rng(0)
    staged_images, staged_cif, staged_caf = [], [], []
    staged_hr, staged_sds, staged_cands = [], [], []
    staged_grown, staged_scale = [], []

    v_cifhr = jax.vmap(cifhr_stage)
    v_seeds = jax.vmap(seeds_stage)
    v_caf = jax.vmap(caf_stage)
    v_growth = jax.vmap(growth_stage)
    v_nms = jax.vmap(nms_stage)
    v_decode = jax.vmap(decode_stage)
    v_scale = jax.vmap(scale_px_of)

    for _ in range(N_STAGED):
        img = jax.device_put(rng.normal(
            size=(BATCH, *IMAGE_HW, 3)).astype(np.float32))
        fields = jax.block_until_ready(forward(variables, img))
        cif_f, caf_f = fields[0], fields[1]
        hr = jax.jit(v_cifhr)(cif_f)
        sds = jax.jit(v_seeds)((cif_f, hr))
        cands = jax.jit(v_caf)((caf_f, hr))
        grown = jax.jit(v_growth)((sds, cands))
        staged_images.append(img)
        staged_cif.append(jax.block_until_ready(cif_f))
        staged_caf.append(jax.block_until_ready(caf_f))
        staged_hr.append(jax.block_until_ready(hr))
        staged_sds.append(jax.block_until_ready(sds))
        staged_cands.append(jax.block_until_ready(cands))
        staged_grown.append(jax.block_until_ready(grown))
        staged_scale.append(jax.block_until_ready(jax.jit(v_scale)(cif_f)))

    def inject_first(x, d):
        return (x[0] + d, *x[1:]) if isinstance(x, tuple) else x + d

    def inject_seeds(x, d):
        sds, cands = x
        return sds._replace(v=sds.v + d), cands

    def inject_grown(x, d):
        (poses, placed, pose_valid, seed_f), scale_px = x
        return (poses + d, placed, pose_valid, seed_f), scale_px

    stages = [
        ('forward', lambda x, c: ((lambda f: (f, f[0].sum().astype(
            jnp.float32) * 1e-9))(model.module.apply(
                variables, x + c * 1e-6, train=False))), staged_images),
        ('cifhr', carried(v_cifhr, inject_first, sum_leaves), staged_cif),
        ('seeds', carried(v_seeds, inject_first, sum_leaves),
         list(zip(staged_cif, staged_hr))),
        ('caf_scored', carried(v_caf, inject_first, sum_leaves),
         list(zip(staged_caf, staged_hr))),
        ('growth', carried(v_growth, inject_seeds, sum_leaves),
         list(zip(staged_sds, staged_cands))),
        ('nms_finalize', carried(v_nms, inject_grown, sum_leaves),
         list(zip(staged_grown, staged_scale))),
        ('decode_full', carried(v_decode, inject_first, sum_leaves),
         list(zip(staged_cif, staged_caf))),
    ]

    rows = []
    for name, step, inputs_list in stages:
        if name == 'forward':
            step = jax.jit(step)
        log(f'compiling + timing {name}...')
        median = chained_time(step, inputs_list)
        lowered = step.lower(inputs_list[0],
                             jnp.zeros((), jnp.float32)).compile()
        flops, bytes_ = cost_of(lowered)
        peak = PEAK_FLOPS_BF16 if name == 'forward' else PEAK_FLOPS_F32
        bound = max(flops / peak, bytes_ / HBM_BW)
        rows.append({
            'stage': name,
            'ms_per_image': median / BATCH * 1e3,
            'gflops': flops / 1e9,
            'mbytes': bytes_ / 1e6,
            'roofline_bound_ms_per_image': bound / BATCH * 1e3,
            'speed_of_light_pct': (100.0 * bound / median) if median else 0.0,
            'dominant_bound': ('compute' if flops / peak > bytes_ / HBM_BW
                               else 'hbm'),
        })

    device = jax.devices()[0]
    result = {
        'device': getattr(device, 'device_kind', device.platform),
        'batch': BATCH, 'image_hw': IMAGE_HW,
        'stages': rows,
    }

    with open(args.out, 'w') as f:
        f.write('# Per-stage TPU timing and roofline\n\n')
        f.write(f'Device: {result["device"]}; batch {BATCH} at '
                f'{IMAGE_HW[0]}px (sn2k16/cocokp, untrained weights — '
                'dense-field worst case for decode budgets). Methodology: '
                'bench.py anti-memoization protocol (distinct staged '
                'inputs, data-dependent carry, per-iteration host '
                'readback). Roofline assumptions: bf16 MXU '
                f'{PEAK_FLOPS_BF16/1e12:.0f} TF/s (forward), f32 '
                f'{PEAK_FLOPS_F32/1e12:.0f} TF/s (decode stages), HBM '
                f'{HBM_BW/1e9:.0f} GB/s.\n\n')
        f.write('| stage | ms/image | GFLOP | MB accessed | roofline '
                'ms/img | % of speed-of-light | bound |\n')
        f.write('|---|---|---|---|---|---|---|\n')
        for r in rows:
            f.write(f'| {r["stage"]} | {r["ms_per_image"]:.3f} | '
                    f'{r["gflops"]:.2f} | {r["mbytes"]:.1f} | '
                    f'{r["roofline_bound_ms_per_image"]:.3f} | '
                    f'{r["speed_of_light_pct"]:.1f} | '
                    f'{r["dominant_bound"]} |\n')
        f.write('\nNote: stage programs overlap less than the fused '
                'decode_full program (XLA fuses across stage boundaries '
                'there), so the stage sum may exceed decode_full.\n')

    print(json.dumps(result))
    return 0


if __name__ == '__main__':
    sys.exit(main())
