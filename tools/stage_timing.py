"""Per-stage decode timing + roofline on the real TPU -> PERF.md.

Round-3 protocol: every stage is timed as a device-resident ``lax.scan``
chain (8 data-dependent iterations per host call, carry read back each
call), so the ~25 ms tunnel RTT is amortized 8x; a noop chain calibrates
the residual floor, which is subtracted.  XLA cost analysis supplies
FLOPs and (fusion-pessimistic) bytes per stage.

Roofline denominators are BOTH the nominal chip peaks and the *measured
attainable* bandwidth of this environment (a large-copy chain), because
the tunneled pool does not deliver nominal HBM rates.

Run from the repo root on the tunneled TPU (~10 min):

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
N_INNER = 8
N_CALLS = 5

PEAK_FLOPS_BF16 = 197e12
PEAK_FLOPS_F32 = 49e12
HBM_BW = 819e9

_T0 = time.perf_counter()


def log(msg):
    print(f'[stage +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def scan_time(fn, stacked):
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
    for _ in range(N_CALLS):
        start = time.perf_counter()
        carry = chain(stacked, carry)
        c = float(carry)
        times.append((time.perf_counter() - start) / N_INNER)
        assert np.isfinite(c)
    return statistics.median(times)


def cost_of(fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0] if c else {}
    c = c or {}
    return (float(c.get('flops', 0.0)),
            float(c.get('bytes accessed', 0.0)))


def hand_bytes_of(fn, inputs, extra_input_bytes: float = 0.0):
    """Hand-counted minimal traffic (VERDICT r3 #6): unique input bytes +
    unique output bytes at the bench shapes, from ``jax.eval_shape`` (no
    FLOPs run).  Returns ``(in_bytes, out_bytes)``.

    ``in_bytes`` alone is a strict lower bound on HBM traffic (every input
    element must be fetched at least once; the scan-chain inputs exceed
    VMEM so they stream).  ``out_bytes`` is *usually* also moved, but the
    timing chain reduces stage outputs into a scalar carry, so XLA may fuse
    away part of the output write — which is why the strict SoL column uses
    inputs only and can never exceed 100.
    """
    import jax

    def nbytes(tree):
        total = 0.0
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, 'shape'):
                total += float(np.prod(leaf.shape)) * np.dtype(
                    leaf.dtype).itemsize
        return total

    out_shapes = jax.eval_shape(fn, inputs)
    return nbytes(inputs) + extra_input_bytes, nbytes(out_shapes)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default='PERF.md')
    args = parser.parse_args()

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
    score_weights = np.asarray(constants.COCO_PERSON_SCORE_WEIGHTS,
                               np.float32)

    # ---- calibration ----
    log('calibrating noop floor + attainable bandwidth...')
    tiny = jnp.zeros((N_INNER, 4, 4), jnp.float32)
    floor_s = scan_time(lambda x, c: (x[0, 0] + c).sum() * 1.000001, tiny)
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.normal(size=(N_INNER, 48, 1024, 1024)
                                 ).astype(np.float32))

    def copyop(x, c):
        y = x * (1.0 + c * 1e-9)
        return y[0, 0, 0] + y[-1, -1, -1]

    t_copy = scan_time(copyop, big)
    measured_bw = 2 * big[0].size * 4 / max(t_copy - floor_s, 1e-9)

    # ---- stage single-image fns ----
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

    def seeds_stage(x):
        cif_field, hr = x
        cifc = split_fields(cif_field, cif_meta)
        x_px, y_px, scale_px = coords(cifc)
        return seeds.select(cifc.conf, x_px, y_px, scale_px, hr,
                            hr_spacing=config.cifhr.spacing,
                            config=config.seeds)

    def caf_stage(x):
        caf_field, hr = x
        cafc = split_fields(caf_field, caf_meta)
        return caf_scored.score(cafc, hr, skeleton, stride=config.stride,
                                hr_spacing=config.cifhr.spacing,
                                config=config.caf)

    def growth_stage(x):
        sds, cands = x
        poses, placed, pose_valid, _, _, seed_f = growth.init_poses(
            sds, n_keypoints=17, config=config.growth)
        poses, placed = growth.grow(poses, placed, pose_valid, cands,
                                    edges, config.growth)
        return poses, placed, pose_valid, seed_f

    def nms_stage(x):
        (poses, placed, pose_valid, seed_f), scale_px = x
        return pipeline.finalize_poses(poses, placed, pose_valid, scale_px,
                                       score_weights=score_weights,
                                       config=config, seed_f=seed_f)

    def decode_stage(x):
        cif_field, caf_field = x
        return pipeline.decode_cifcaf_single(
            cif_field, caf_field, cif_meta=cif_meta, caf_meta=caf_meta,
            config=config)

    def scale_px_of(cif_field):
        return coords(split_fields(cif_field, cif_meta))[2]

    # ---- stage the intermediates (one batch) ----
    log('forward + staging intermediates...')
    fwd = jax.jit(lambda v, x: model.apply_fast(v, x))
    imgs = jax.device_put(
        rng.normal(size=(BATCH, *IMAGE_HW, 3)).astype(np.float32))
    fields = jax.block_until_ready(fwd(variables, imgs))
    cif_f, caf_f = fields[0], fields[1]
    hr = jax.block_until_ready(jax.jit(jax.vmap(cifhr_stage))(cif_f))
    sds = jax.block_until_ready(jax.jit(jax.vmap(seeds_stage))((cif_f, hr)))
    cands = jax.block_until_ready(jax.jit(jax.vmap(caf_stage))((caf_f, hr)))
    grown = jax.block_until_ready(
        jax.jit(jax.vmap(growth_stage))((sds, cands)))
    scale = jax.block_until_ready(jax.jit(jax.vmap(scale_px_of))(cif_f))

    def sum_leaves(tree):
        leaves = [l for l in jax.tree.leaves(tree)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(l.sum().astype(jnp.float32) for l in leaves) * 1e-9

    def inj_first(x, d):
        return (x[0] + d, *x[1:]) if isinstance(x, tuple) else x + d

    def inj_seeds(x, d):
        sds, cands = x
        return sds._replace(v=sds.v + d), cands

    def inj_grown(x, d):
        (poses, placed, pose_valid, seed_f), scale_px = x
        return (poses + d, placed, pose_valid, seed_f), scale_px

    stages = [
        ('forward',
         lambda x, c: sum_leaves(fwd(variables, x + c * 1e-6)),
         lambda x: fwd(variables, x), imgs, inj_first, PEAK_FLOPS_BF16),
        ('cifhr',
         None, jax.vmap(cifhr_stage), cif_f, inj_first, PEAK_FLOPS_F32),
        ('seeds',
         None, jax.vmap(seeds_stage), (cif_f, hr), inj_first,
         PEAK_FLOPS_F32),
        ('caf_scored',
         None, jax.vmap(caf_stage), (caf_f, hr), inj_first, PEAK_FLOPS_F32),
        ('growth',
         None, jax.vmap(growth_stage), (sds, cands), inj_seeds,
         PEAK_FLOPS_F32),
        ('nms_finalize',
         None, jax.vmap(nms_stage), (grown, scale), inj_grown,
         PEAK_FLOPS_F32),
        ('decode_full',
         None, jax.vmap(decode_stage), (cif_f, caf_f), inj_first,
         PEAK_FLOPS_F32),
    ]

    n_param_bytes = sum(
        float(np.prod(p.shape)) * np.dtype(p.dtype).itemsize
        for p in jax.tree.leaves(variables))

    rows = []
    for name, step, vfn, inputs, inject, peak in stages:
        if step is None:
            def step(x, c, vfn=vfn, inject=inject):
                return sum_leaves(vfn(inject(x, c * 1e-6)))
        log(f'{name}: compile + time...')
        stacked = jax.tree.map(lambda a: jnp.stack([a] * N_INNER), inputs)
        raw_s = scan_time(step, stacked)
        below_floor = (raw_s - floor_s) <= 0.05 * floor_s
        net_s = max(raw_s - floor_s, 1e-9)
        flops, bytes_ = cost_of(vfn, inputs)
        # hand-counted minimal traffic (forward additionally reads the
        # parameter tree, which is closed over rather than an input)
        in_b, out_b = hand_bytes_of(
            vfn, inputs,
            extra_input_bytes=(n_param_bytes if name == 'forward' else 0.0))
        # the compute leg of a LOWER bound must use the fastest peak the
        # FLOPs could possibly run at: the bf16 MXU rate (the front-end
        # einsums run in bf16 since r3; charging f32 peak would let a
        # stage 'exceed' its own bound)
        bound_hand = max(flops / PEAK_FLOPS_BF16, (in_b + out_b) / HBM_BW)
        bound_strict = max(flops / PEAK_FLOPS_BF16, in_b / HBM_BW)
        bound_xla = max(flops / peak, bytes_ / HBM_BW)
        rows.append({
            'stage': name,
            'ms_per_image': net_s / BATCH * 1e3,
            'raw_ms_per_image': raw_s / BATCH * 1e3,
            'gflops': flops / 1e9,
            'hand_in_mb': in_b / 1e6,
            'hand_out_mb': out_b / 1e6,
            'xla_mbytes': bytes_ / 1e6,
            'hand_bound_ms': bound_hand / BATCH * 1e3,
            'strict_bound_ms': bound_strict / BATCH * 1e3,
            'xla_bound_ms': bound_xla / BATCH * 1e3,
            # a stage at/below the dispatch floor has no measurable net
            # time — a SoL%% against ~0 is meaningless, report None
            'sol_hand_pct': (None if below_floor
                             else 100.0 * bound_hand / net_s),
            'sol_strict_pct': (None if below_floor
                               else 100.0 * bound_strict / net_s),
            'dominant': ('compute'
                         if flops / PEAK_FLOPS_BF16
                         > (in_b + out_b) / HBM_BW
                         else 'hbm'),
        })
        print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                          for k, v in rows[-1].items()}), flush=True)


    device = jax.devices()[0]
    result = {
        'device': getattr(device, 'device_kind', device.platform),
        'batch': BATCH, 'image_hw': IMAGE_HW,
        'noop_floor_ms_per_image': floor_s / BATCH * 1e3,
        'measured_copy_bandwidth_gbs': measured_bw / 1e9,
        'stages': rows,
    }

    with open(args.out, 'w') as f:
        f.write('# Per-stage TPU timing and roofline (round 4)\n\n')
        f.write(
            f'Device: {result["device"]}; batch {BATCH} at '
            f'{IMAGE_HW[0]}px (sn2k16/cocokp, untrained weights — '
            'dense-field worst case for decode budgets; fused inference '
            'plan).  Protocol: device-resident lax.scan chains of '
            f'{N_INNER} data-dependent iterations per host call; the '
            f'measured noop floor ({result["noop_floor_ms_per_image"]:.2f}'
            ' ms/img — tunnel RTT amortized over the chain) is '
            'subtracted.\n\n'
            'Bounds are **hand-counted minimal traffic** (VERDICT r3 #6), '
            'not XLA cost-analysis bytes: *hand* = unique input + unique '
            'output bytes of the stage at the bench shapes (forward also '
            'counts the parameter read); *strict* = input bytes only.  '
            'The strict column is a true lower bound on stage time — '
            'every input element must be fetched from HBM at least once '
            '(chain inputs exceed VMEM, so they stream) — hence '
            '**strict SoL%% can never exceed 100**.  The hand column '
            'additionally charges the output write, which the timing '
            'chain may legitimately fuse into its scalar-carry reduction; '
            'it is the fair-comparison column for stages whose consumers '
            'read the outputs from HBM.  Compute legs use bf16 '
            f'{PEAK_FLOPS_BF16 / 1e12:.0f} / f32 '
            f'{PEAK_FLOPS_F32 / 1e12:.0f} TF/s, HBM '
            f'{HBM_BW / 1e9:.0f} GB/s nominal.  (The environment\'s '
            'large-copy calibration is invalid over the tunnel — '
            f'{result["measured_copy_bandwidth_gbs"]:.0f} GB/s apparent — '
            'and is not used.)\n\n')
        f.write('| stage | ms/image | GFLOP | hand MB in+out | hand bound '
                'ms | % of hand SoL | strict bound ms | % of strict SoL '
                '| bound |\n')
        f.write('|---|---|---|---|---|---|---|---|---|\n')
        for r in rows:
            sol_h = ('-' if r['sol_hand_pct'] is None
                     else f'{r["sol_hand_pct"]:.0f}')
            sol_s = ('-' if r['sol_strict_pct'] is None
                     else f'{r["sol_strict_pct"]:.0f}')
            f.write(f'| {r["stage"]} | {r["ms_per_image"]:.3f} | '
                    f'{r["gflops"]:.2f} | '
                    f'{r["hand_in_mb"]:.1f}+{r["hand_out_mb"]:.1f} | '
                    f'{r["hand_bound_ms"]:.3f} | '
                    f'{sol_h} | '
                    f'{r["strict_bound_ms"]:.3f} | '
                    f'{sol_s} | '
                    f'{r["dominant"]} |\n')
        f.write(
            '\nNotes: stage programs overlap less than the fused '
            'decode_full program (XLA fuses across stage boundaries '
            'there), so the stage sum exceeds decode_full.  Reading the '
            'SoL columns: a stage at a low %% of its *strict* bound is '
            'NOT necessarily leaving that headroom on the table — the '
            'minimal-traffic model credits nothing for intermediate '
            'tensors (gather tables, per-round growth state) that real '
            'schedules must spill; the bound is honest about direction '
            '(always <= 100) at the cost of being loose for '
            'intermediate-heavy stages.  The defensible ceiling claims '
            'are therefore: (1) the forward is activation-traffic-bound '
            '(batch-insensitive 3.99/4.03/4.03 ms/img at batch 8/16/32, '
            'r3 probe) and sits within ~2x of even the no-intermediate '
            'hand bound; (2) decode_full is a small fraction of the e2e '
            'step (bench.py: 0.65-1.0 ms/img vs 4.6 ms/img e2e), so '
            'further decode optimization cannot move the headline '
            'materially; (3) with the r4 fused training plan the train '
            'step shares (1)\'s regime (TRAINBENCH pct_of_sol_hand).\n')

    print(json.dumps(result))
    return 0


if __name__ == '__main__':
    sys.exit(main())
