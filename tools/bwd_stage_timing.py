"""Per-segment BACKWARD (VJP) timing of the pair TRAINING plan.

VERDICT r4 #4: the r4 train-step attribution stopped at a sandwich
(111%-of-XLA-bytes vs 14%-of-hand-bound); this tool locates where the
backward actually goes.  For every forward segment of the pair training
plan (conv1, stage2-4, conv5, heads, loss) it times, on staged real
intermediates with the scan-chain discipline of
``tools/fwd_stage_timing.py``:

- ``fwd``: the segment's training forward alone;
- ``fwd+vjp``: ``jax.vjp`` through the segment w.r.t. (segment params,
  input activation) plus the cotangent pull — the chain feeds the input
  gradient back into the next iteration's input, so iterations are
  data-dependent and cannot be memoized;
- ``bwd`` = the difference: the segment's backward cost including its
  parameter-gradient and activation-gradient work.

Segment boundaries materialize the (a, b) pair via the interleave fold
(same probe convention as the forward tool), so per-segment numbers sum
to slightly more than the monolithic step (boundary materializations +
scan overhead) — compare against TRAINBENCH.json's step_ms.

Run from the repo root on the TPU (~6 min):

    python tools/bwd_stage_timing.py [--basenet shufflenetv2k16]
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
N_INNER = 4
N_CALLS = 5

_T0 = time.perf_counter()


def log(msg):
    print(f'[bwd +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def scan_time(fn, xin):
    """Median s/iteration of a data-dependent chain x -> fn(x) -> x'."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, x, None, length=N_INNER)
        return out

    x = chain(xin)
    jax.block_until_ready(x)
    times = []
    for _ in range(N_CALLS):
        start = time.perf_counter()
        x = chain(xin)
        jax.block_until_ready(x)
        times.append((time.perf_counter() - start) / N_INNER)
    return statistics.median(times)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from openpifpaf_tpu import headmeta, losses, models
    from openpifpaf_tpu.models import fused_shufflenet as fs
    from openpifpaf_tpu.plugins.coco import constants

    parser = argparse.ArgumentParser()
    parser.add_argument('--basenet', default='shufflenetv2k16')
    parser.add_argument('--out', default='/tmp/bwd_stages.json')
    args = parser.parse_args()

    cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name=args.basenet, bf16=True)
    model = factory.from_scratch(args.basenet, [cif, caf])
    model.init(jax.random.key(0), input_hw=(65, 65))
    loss_fn = losses.Factory().factory(model.head_metas)
    variables = model.variables
    module = model.module.basenet
    p_all = variables['params']['basenet']
    s_all = variables['batch_stats']['basenet']
    dtype = module.dtype
    momentum = 0.9

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(BATCH, *IMAGE_HW, 3))
                       .astype(np.float32))

    # ---- training-mode segments over the pair plan; each takes
    # (seg_params, x) so the VJP includes the parameter-gradient work ----
    def seg_conv1(pp, x):
        x = x.astype(dtype)
        k1 = pp['conv1']['kernel'].astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, k1, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        y, _ = fs._bn_train(pp['conv1_norm'], s_all['conv1_norm'], x,
                            dtype, momentum)
        return nn.relu(y)

    def make_stage(stage_i, repeats):
        def seg(pp, x):
            state = (x[..., 0::2], x[..., 1::2]) if stage_i > 2 else x
            state, _ = fs._block_stride2_pair_train(
                state, pp[f'stage{stage_i}_0'], s_all[f'stage{stage_i}_0'],
                2, dtype, momentum)
            for bi in range(1, repeats):
                state, _ = fs._block_stride1_pair_train(
                    state, pp[f'stage{stage_i}_{bi}'],
                    s_all[f'stage{stage_i}_{bi}'], dtype, momentum)
            a, b = state
            q = a.shape[-1]
            pe, po = fs._interleave_matrices(q)
            return (fs._mm(a, jnp.asarray(pe), dtype)
                    + fs._mm(b, jnp.asarray(po), dtype))
        return seg

    def seg_conv5(pp, x):
        x = fs._mm(x, fs._kernel2d(pp['conv5']), dtype)
        y, _ = fs._bn_train(pp['conv5_norm'], s_all['conv5_norm'], x,
                            dtype, momentum)
        return nn.relu(y)

    def seg_heads(pp, feats):
        outs = []
        for i, head in enumerate(model.module.head_nets):
            outs.append(head.apply({'params': pp[f'head_nets_{i}']},
                                   feats, train=True))
        return outs

    fh = (IMAGE_HW[0] - 1) // 16 + 1
    fw = (IMAGE_HW[1] - 1) // 16 + 1

    def target_for(meta):
        f, nv, ns = meta.n_fields, meta.n_vectors, meta.n_scales
        conf = (rng.uniform(0, 1, (BATCH, f, fh, fw)) < 0.02).astype(
            np.float32)
        return {
            'conf': conf,
            'conf_mask': np.ones((BATCH, f, fh, fw), bool),
            'vec': rng.normal(size=(BATCH, f, nv, 2, fh, fw)).astype(
                np.float32),
            'vec_mask': np.broadcast_to(
                conf.astype(bool)[:, :, None], (BATCH, f, nv, fh, fw)),
            'scale': np.abs(rng.normal(
                2.0, 1.0, (BATCH, f, ns, fh, fw))).astype(np.float32),
            'scale_mask': np.broadcast_to(
                conf.astype(bool)[:, :, None], (BATCH, f, ns, fh, fw)),
        }

    targets = jax.device_put([target_for(m) for m in model.head_metas])

    def seg_loss(_, fields):
        total, _comps = loss_fn(fields, targets)
        return total

    # stage the forward intermediates
    log('staging intermediates...')
    seg_param_trees = {
        'conv1': {'conv1': p_all['conv1'], 'conv1_norm': p_all['conv1_norm']},
        'conv5': {'conv5': p_all['conv5'], 'conv5_norm': p_all['conv5_norm']},
        'heads': {k: v for k, v in variables['params'].items()
                  if k.startswith('head_nets_')},
        'loss': {},
    }
    segments = [('conv1', seg_conv1)]
    for stage_i, repeats in zip((2, 3, 4), module.stages_repeats):
        segments.append((f'stage{stage_i}', make_stage(stage_i, repeats)))
        seg_param_trees[f'stage{stage_i}'] = {
            k: v for k, v in p_all.items()
            if k.startswith(f'stage{stage_i}_')}
    segments += [('conv5', seg_conv5), ('heads', seg_heads),
                 ('loss', seg_loss)]

    inputs = {}
    x = imgs
    for name, fn in segments:
        inputs[name] = x
        x = jax.block_until_ready(jax.jit(fn)(seg_param_trees[name], x))

    rows = []
    total_fwd = total_bwd = 0.0
    for name, fn in segments:
        xin = inputs[name]
        pp = seg_param_trees[name]

        def fwd_step(x, fn=fn, pp=pp, xin=xin):
            out = fn(pp, x)
            # data dependence: inject a tiny functional of the output back
            # into the next iteration's input (keeps x's shape/dtype)
            leaves = jax.tree.leaves(out)
            probe = sum(l.sum().astype(jnp.float32) for l in leaves) * 1e-12
            return jax.tree.map(
                lambda t: t + probe.astype(t.dtype), xin)

        def vjp_step(x, fn=fn, pp=pp, xin=xin):
            out, vjp = jax.vjp(lambda q, z: fn(q, z), pp, x)
            cot = jax.tree.map(lambda t: jnp.ones_like(t), out)
            gp, gx = vjp(cot)
            probe = (sum(l.sum().astype(jnp.float32)
                         for l in jax.tree.leaves(gp)) * 1e-12
                     + sum(l.sum().astype(jnp.float32)
                           for l in jax.tree.leaves(gx)) * 1e-12)
            return jax.tree.map(lambda t: t + probe.astype(t.dtype), xin)

        log(f'{name}: fwd...')
        t_fwd = scan_time(fwd_step, xin)
        log(f'{name}: fwd+vjp...')
        t_both = scan_time(vjp_step, xin)
        row = {'segment': name,
               'fwd_ms_img': round(t_fwd * 1e3 / BATCH, 4),
               'fwd_bwd_ms_img': round(t_both * 1e3 / BATCH, 4),
               'bwd_ms_img': round((t_both - t_fwd) * 1e3 / BATCH, 4)}
        total_fwd += t_fwd
        total_bwd += t_both - t_fwd
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        'basenet': args.basenet, 'batch': BATCH, 'image_hw': IMAGE_HW,
        'sum_fwd_ms_img': round(total_fwd * 1e3 / BATCH, 3),
        'sum_bwd_ms_img': round(total_bwd * 1e3 / BATCH, 3),
        'note': 'chain includes per-iteration probe injection; compare '
                'sums against TRAINBENCH step_ms (monolithic step adds '
                'optimizer/EMA and saves boundary materializations)',
        'segments': rows,
    }
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
