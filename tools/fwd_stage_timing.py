"""Per-stage timing of the FUSED ShuffleNetV2K inference forward.

Locates where the 3.6 ms/img forward (the e2e binder, PERF.md ceiling
argument) actually goes: conv1, each stage, conv5, heads — each timed as
its own device-resident scan chain over staged real intermediates (same
anti-memoization protocol as tools/stage_timing.py).  Guides the next
routing/fusion attack: if the stride-1 routing matmuls dominate a stage,
the deferred symbolic fold is worth building; if the depthwise convs or
stage-2's 161x161 activations dominate, it is not.

Run from the repo root on the TPU (~4 min):

    python tools/fwd_stage_timing.py
"""

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
N_CALLS = 6

_T0 = time.perf_counter()


def log(msg):
    print(f'[fwd +{time.perf_counter() - _T0:7.1f}s] {msg}',
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


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from openpifpaf_tpu import headmeta, models
    from openpifpaf_tpu.models import fused_shufflenet as fs
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
    module = model.module.basenet
    p = variables['params']['basenet']
    s = variables['batch_stats']['basenet']
    dtype = module.dtype

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(BATCH, *IMAGE_HW, 3))
                       .astype(np.float32))

    # ---- build per-segment functions over the fused plan ----
    def seg_conv1(x):
        x = x.astype(dtype)
        k1 = p['conv1']['kernel'].astype(dtype)
        x = jax.lax.conv_general_dilated(
            x, k1, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return nn.relu(fs._bn(p['conv1_norm'], s['conv1_norm'], x, dtype))

    def make_stage(stage_i, repeats):
        # r4 pair plan: stages consume/produce (a, b) pairs; the probe
        # materializes at segment boundaries only (interleave matmuls) so
        # segments remain independently timeable
        def seg(x):
            state = (x[..., 0::2], x[..., 1::2]) if stage_i > 2 else x
            state = fs._block_stride2_pair(
                state, p[f'stage{stage_i}_0'], s[f'stage{stage_i}_0'], 2,
                dtype)
            for bi in range(1, repeats):
                state = fs._block_stride1_pair(
                    state, p[f'stage{stage_i}_{bi}'],
                    s[f'stage{stage_i}_{bi}'], dtype)
            a, b = state
            q = a.shape[-1]
            pe, po = fs._interleave_matrices(q)
            return (fs._mm(a, jnp.asarray(pe), dtype)
                    + fs._mm(b, jnp.asarray(po), dtype))
        return seg

    def seg_conv5(x):
        x = fs._mm(x, fs._kernel2d(p['conv5']), dtype)
        return nn.relu(fs._bn(p['conv5_norm'], s['conv5_norm'], x, dtype))

    def seg_heads(feats):
        outs = []
        for i, head in enumerate(model.module.head_nets):
            outs.append(head.apply(
                {'params': variables['params'][f'head_nets_{i}']},
                feats, train=False))
        return outs

    # routing-only variant of a stage: just the Px/Po matmuls on the
    # stage's shapes, to isolate the routing matmul cost
    def make_routing_only(c, n_blocks):
        def seg(x):
            for _ in range(n_blocks):
                px, _, po = fs._routing_matrices(c)
                x = (fs._mm(x, jnp.asarray(px), dtype)
                     + fs._mm(x[..., :c // 2], jnp.asarray(po), dtype))
            return x
        return seg

    segments = [
        ('conv1', seg_conv1, imgs),
    ]

    # stage the intermediates
    log('staging intermediates...')
    x = jax.jit(seg_conv1)(imgs)
    x = jax.block_until_ready(x)
    inter = {'conv1': x}
    for stage_i, repeats in zip((2, 3, 4), module.stages_repeats):
        segf = make_stage(stage_i, repeats)
        segments.append((f'stage{stage_i}', segf, x))
        x = jax.block_until_ready(jax.jit(segf)(x))
        inter[f'stage{stage_i}'] = x
    segments.append(('conv5', seg_conv5, x))
    feats = jax.block_until_ready(jax.jit(seg_conv5)(x))
    segments.append(('heads', seg_heads, feats))

    # routing-only probes at each stage's (post-downsample) shape
    for stage_i, repeats in zip((2, 3, 4), module.stages_repeats):
        xin = inter[f'stage{stage_i}']
        segments.append((f'routing_only_stage{stage_i}',
                         make_routing_only(xin.shape[-1], repeats - 1), xin))

    # noop floor
    tiny = jnp.zeros((N_INNER, 4, 4), jnp.float32)
    floor = scan_time(lambda x, c: (x[0, 0] + c).sum() * 1.000001, tiny)

    rows = []
    for name, fn, xin in segments:
        def step(x, c, fn=fn):
            # keep the carry injection in x's dtype (a f32 carry would
            # promote a bf16 intermediate and break the dw-conv dtypes)
            out = fn(x + (c * 1e-6).astype(x.dtype))
            leaves = [l for l in jax.tree.leaves(out)]
            return sum(l.sum().astype(jnp.float32) for l in leaves) * 1e-9
        log(f'{name}: compile + time...')
        stacked = jnp.stack([xin] * N_INNER)
        raw = scan_time(step, stacked)
        rows.append({'segment': name,
                     'ms_per_image': (raw - floor) / BATCH * 1e3,
                     'raw_ms_per_image': raw / BATCH * 1e3})
        print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in rows[-1].items()}), flush=True)

    print(json.dumps({'noop_floor_ms_per_image': floor / BATCH * 1e3,
                      'segments': rows}))
    return 0


if __name__ == '__main__':
    sys.exit(main())
