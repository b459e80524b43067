"""Training-step benchmark with MFU (VERDICT r2 next-round item 4).

BASELINE config 3: ShuffleNetV2k16 / ResNet-50 COCO keypoint training on
one chip at the 641px eval resolution.  Methodology matches bench.py:

- the step chain is *naturally* anti-memoization — each ``lax.scan``
  iteration consumes the previous iteration's parameters and optimizer
  state, so steps can neither be reordered nor served from a cache;
- ``n_staged`` distinct (image, target) batches are staged on device;
- the loss scalar is fetched to the host after every timed call;
- MFU = XLA cost-analysis FLOPs of one jitted step / measured step time /
  chip peak (bf16).

Additionally measures the host input pipeline — the C++ CIF/CAF target
encoders (``csrc/encoders.cpp``) on realistic multi-person annotations at
the same resolution — and reports whether the host keeps up with the
device step rate (reference pain point: per-image Python encoders in
dataloader workers, ``src/openpifpaf/trainer.py:~150`` hot loop).

Writes TRAINBENCH.json.  Run from the repo root on the TPU:

    python tools/train_bench.py
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
BATCH = 8
IMAGE_HW = (641, 641)
N_STAGED = 2
N_INNER = 4
N_CALLS = 4
PEAK_BF16 = 197e12
HBM_BW = 819e9


def minimal_step_traffic(model, params, opt_state) -> float:
    """Hand-counted minimal HBM traffic (bytes) of one train step.

    A true LOWER bound (so SoL%% against it can never exceed 100):

    - parameters: fwd read (f32) + grad write + optimizer momentum r/w +
      param r/w + EMA r/w = 32 B/element;
    - activations: only nn.Conv outputs are counted (BN/relu fuse into the
      convs), each materialized once in the forward (bf16 write), read once
      in the backward, and its gradient written + read once = 8 B/element.
      Intermediate shapes come from ``jax.eval_shape`` with flax
      ``capture_intermediates`` filtered to Conv modules — no FLOPs run.
    - images read once (f32).
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    param_bytes = 32.0 * n_params

    def f(x):
        _, mods = model.module.apply(
            model.variables, x, train=True,
            mutable=['batch_stats', 'intermediates'],
            capture_intermediates=lambda mdl, name: isinstance(mdl, nn.Conv))
        return mods['intermediates']

    shapes = jax.eval_shape(
        f, jax.ShapeDtypeStruct((BATCH, *IMAGE_HW, 3), jnp.float32))
    act_elems = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
    act_bytes = 8.0 * act_elems
    image_bytes = 4.0 * BATCH * IMAGE_HW[0] * IMAGE_HW[1] * 3
    return param_bytes + act_bytes + image_bytes


def log(msg):
    print(f'[tb +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def build(basenet: str):
    import jax

    from openpifpaf_tpu import headmeta, losses, models
    from openpifpaf_tpu.plugins.coco import constants

    cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name=basenet, bf16=True)
    model = factory.from_scratch(basenet, [cif, caf])
    model.init(jax.random.key(0), input_hw=(65, 65))
    loss_fn = losses.Factory().factory(model.head_metas)
    return model, loss_fn


def synthetic_annotations(rng, n_people: int):
    from openpifpaf_tpu.plugins.coco import constants

    anns = []
    for _ in range(n_people):
        scale = rng.uniform(20.0, 90.0)
        cx = rng.uniform(60, IMAGE_HW[1] - 60)
        cy = rng.uniform(60, IMAGE_HW[0] - 60)
        pose = constants.COCO_UPRIGHT_POSE
        kp = np.zeros((17, 3), np.float32)
        kp[:, 0] = pose[:, 0] * scale / 4.0 + cx
        kp[:, 1] = (5.0 - pose[:, 1] / 2.0) * scale / 4.0 + cy
        kp[:, 2] = np.where(rng.uniform(size=17) < 0.85, 2.0, 0.0)
        anns.append({'keypoints': kp, 'iscrowd': 0,
                     'bbox_original': [0, 0, 50, 50]})
    return anns


def encoder_throughput(model):
    """Host C++ encoder images/s on realistic multi-person scenes."""
    from openpifpaf_tpu import encoder

    encoders = encoder.factory(model.head_metas)
    rng = np.random.default_rng(0)
    scenes = [synthetic_annotations(rng, int(rng.integers(1, 8)))
              for _ in range(24)]

    class Ann:
        def __init__(self, d):
            self.data = d['keypoints']
            self.keypoints = d['keypoints']
            self.iscrowd = d['iscrowd']
            self.bbox = None
            self.fixed_bbox = None

    meta = {'valid_area': (0, 0, IMAGE_HW[1] - 1, IMAGE_HW[0] - 1),
            'width_height': (IMAGE_HW[1], IMAGE_HW[0])}
    image = np.zeros((*IMAGE_HW, 3), np.float32)
    # warmup (builds the native lib on first use)
    for enc in encoders:
        enc(image, [Ann(d) for d in scenes[0]], meta)
    start = time.perf_counter()
    n = 0
    while time.perf_counter() - start < 3.0:
        for scene in scenes:
            anns = [Ann(d) for d in scene]
            for enc in encoders:
                enc(image, anns, meta)
            n += 1
    return n / (time.perf_counter() - start)


def bench_model(basenet: str, fused: bool = False, remat: str = 'none'):
    import jax
    import jax.numpy as jnp
    import optax

    from openpifpaf_tpu.training.optimize import OptimizeFactory

    label = f'{basenet}{"+fused" if fused else ""}' \
        + (f'+remat:{remat}' if remat != 'none' else '')
    log(f'{label}: building...')
    model, loss_fn = build(basenet)

    opt_factory = OptimizeFactory()
    tx = opt_factory.optimizer(opt_factory.schedule(steps_per_epoch=100))
    params = model.variables['params']
    batch_stats = model.variables.get('batch_stats', {})
    opt_state = tx.init({'params': params})

    fh = (IMAGE_HW[0] - 1) // 16 + 1
    fw = (IMAGE_HW[1] - 1) // 16 + 1
    rng = np.random.default_rng(0)

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

    staged = []
    for _ in range(N_STAGED):
        images = rng.normal(size=(BATCH, *IMAGE_HW, 3)).astype(np.float32)
        targets = [target_for(m) for m in model.head_metas]
        staged.append(jax.device_put((images, targets)))
    stacked = jax.tree.map(lambda *xs: jnp.stack(list(xs) * (
        (N_INNER + N_STAGED - 1) // N_STAGED))[:N_INNER], *staged)

    from openpifpaf_tpu.models import fused_shufflenet

    use_fused = (fused
                 and fused_shufflenet.supports_train(model, model.variables))

    # remat policy sweep (VERDICT r4 #4): wrap the model apply in
    # jax.checkpoint under the named policy; 'none' = store everything
    policies = {
        'none': None,
        'dots': jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        'nothing': jax.checkpoint_policies.nothing_saveable,
    }

    def apply_train(variables, images):
        if use_fused:
            return fused_shufflenet.shell_apply_train(model, variables,
                                                      images)
        return model.apply(variables, images, train=True,
                           mutable=['batch_stats'])

    if remat != 'none':
        apply_train = jax.checkpoint(apply_train, policy=policies[remat])

    def train_step(params, batch_stats, opt_state, images, targets):
        def loss_of(p):
            variables = {'params': p}
            if batch_stats:
                variables['batch_stats'] = batch_stats
                fields, mutated = apply_train(variables, images)
                new_stats = mutated['batch_stats']
            else:
                fields = model.apply(variables, images, train=True)
                new_stats = batch_stats
            total, comps = loss_fn(fields, targets)
            return total, new_stats

        (total, new_stats), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        updates, new_opt_state = tx.update({'params': grads}, opt_state,
                                           {'params': params})
        new_params = optax.apply_updates({'params': params},
                                         updates)['params']
        return new_params, new_stats, new_opt_state, total

    @jax.jit
    def chain(params, batch_stats, opt_state, stacked):
        def body(carry, batch):
            params, batch_stats, opt_state, _ = carry
            images, targets = batch
            params, batch_stats, opt_state, total = train_step(
                params, batch_stats, opt_state, images, targets)
            return (params, batch_stats, opt_state, total), ()
        carry, _ = jax.lax.scan(
            body, (params, batch_stats, opt_state,
                   jnp.zeros((), jnp.float32)), stacked)
        return carry

    log(f'{label}: compiling train chain...')
    state = chain(params, batch_stats, opt_state, stacked)
    jax.block_until_ready(state)

    times = []
    for _ in range(N_CALLS):
        start = time.perf_counter()
        state = chain(state[0], state[1], state[2], stacked)
        loss_host = float(state[3])
        times.append((time.perf_counter() - start) / N_INNER)
        assert np.isfinite(loss_host), 'non-finite loss'
    step_s = statistics.median(times)

    log(f'{label}: cost analysis...')
    one = jax.jit(train_step)
    cost = one.lower(params, batch_stats, opt_state,
                     *jax.tree.map(lambda a: a[0], stacked)).compile(
                     ).cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    flops = float((cost or {}).get('flops', 0.0))
    xla_bytes = float((cost or {}).get('bytes accessed', 0.0))
    mfu = flops / step_s / PEAK_BF16

    # nominal speed-of-light bound (same discipline as stage_timing.py,
    # VERDICT r3 #4): whichever of MXU peak / HBM bandwidth binds.  XLA
    # bytes overcount fused intermediates, so the HBM leg is conservative
    # (the bound is *larger* than the true minimum time); a hand-counted
    # minimal-traffic bound is reported alongside so the SoL%% can never
    # exceed 100 against it.
    bound_xla_s = max(flops / PEAK_BF16, xla_bytes / HBM_BW)
    hand_bytes = minimal_step_traffic(model, params, opt_state)
    bound_hand_s = max(flops / PEAK_BF16, hand_bytes / HBM_BW)

    log(f'{label}: host encoder throughput...')
    enc_rate = encoder_throughput(model)

    device_rate = BATCH / step_s
    return {
        'basenet': basenet, 'train_plan': ('fused' if use_fused
                                           else 'baseline'),
        'remat': remat,
        'batch': BATCH, 'image_hw': IMAGE_HW,
        'step_ms': round(step_s * 1e3, 2),
        'images_per_s': round(device_rate, 2),
        'step_gflops': round(flops / 1e9, 1),
        'mfu_pct': round(100 * mfu, 2),
        'xla_bytes_gb': round(xla_bytes / 1e9, 2),
        'hand_min_bytes_gb': round(hand_bytes / 1e9, 2),
        'bound_ms_xla_bytes': round(bound_xla_s * 1e3, 2),
        'bound_ms_hand_bytes': round(bound_hand_s * 1e3, 2),
        # % of speed-of-light vs the hand-counted LOWER-bound traffic:
        # by construction this can never exceed 100
        'pct_of_sol_hand': round(100 * bound_hand_s / step_s, 1),
        'pct_of_sol_xla': round(100 * bound_xla_s / step_s, 1),
        'encoder_images_per_s_1core': round(enc_rate, 1),
        'encoder_workers_needed': round(device_rate / enc_rate, 2),
    }


def main():
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument(
        '--models', nargs='+',
        default=['shufflenetv2k16', 'shufflenetv2k16+fused', 'resnet50',
                 'shufflenetv2k30', 'shufflenetv2k30+fused'],
        help="specs like 'shufflenetv2k16+fused' or "
             "'shufflenetv2k16+fused+remat:dots'")
    parser.add_argument('--out', default=os.path.join(REPO,
                                                      'TRAINBENCH.json'))
    args = parser.parse_args()

    device = jax.devices()[0]
    rows = []
    for spec in args.models:
        parts = spec.split('+')
        basenet = parts[0]
        fused = 'fused' in parts[1:]
        remat = next((p.split(':', 1)[1] for p in parts[1:]
                      if p.startswith('remat:')), 'none')
        rows.append(bench_model(basenet, fused=fused, remat=remat))
    out = {'device': getattr(device, 'device_kind', device.platform),
           'protocol': 'scan-chained steps, params carried (anti-memo), '
                       'loss readback per call',
           'models': rows}
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == '__main__':
    sys.exit(main())
