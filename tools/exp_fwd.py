"""Round-3 forward-path experiments: where do the 4.6 ms/img go?

Times truncated sn2k16 forward programs (stem, +stage2, +stage3, +stage4,
+conv5, +heads) and batch scaling with the device-resident scan-chain
protocol from bench.py (tunnel RTT paid once per 8 iterations), plus XLA
cost analysis per program.  Prints one JSON line per variant.

Run from the repo root on the tunneled TPU:  python tools/exp_fwd.py
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


def log(msg):
    print(f'[exp +{time.perf_counter() - _T0:7.1f}s] {msg}',
          file=sys.stderr, flush=True)


def scan_time(fn, stacked, n_inner, n_calls=5):
    """Median per-iteration seconds of a device-resident chain."""
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


def cost_of(fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0] if c else {}
    c = c or {}
    return float(c.get('flops', 0)), float(c.get('bytes accessed', 0))


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from openpifpaf_tpu import headmeta, models
    from openpifpaf_tpu.models.base import NormFactory
    from openpifpaf_tpu.models.shufflenetv2k import InvertedResidualK
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

    image_hw = (641, 641)
    rng = np.random.default_rng(0)
    n_inner = 8

    results = []

    def report(name, batch, sec_per_iter, flops, bytes_):
        ms_img = sec_per_iter / batch * 1e3
        row = {
            'name': name, 'batch': batch,
            'ms_per_image': round(ms_img, 3),
            'gflop_per_img': round(flops / batch / 1e9, 2),
            'mb_per_img': round(bytes_ / batch / 1e6, 1),
            'hbm_ms_per_img': round(bytes_ / batch / 819e9 * 1e3, 3),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    # ---------- truncated backbone prefixes ----------
    class Prefix(nn.Module):
        upto: str  # 'stem', 'stage2', 'stage3', 'stage4', 'conv5'
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=False):
            norm = NormFactory('batchnorm')
            kw = dict(use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32)
            x = x.astype(self.dtype)
            x = nn.Conv(24, (3, 3), strides=2, padding=1, name='conv1',
                        **kw)(x)
            x = nn.relu(norm(self, 'conv1_norm', x, train))
            if self.upto == 'stem':
                return x
            reps = {'stage2': (4,), 'stage3': (4, 8), 'stage4': (4, 8, 4),
                    'conv5': (4, 8, 4)}[self.upto]
            chans = (348, 696, 1392)
            for stage_i, repeats in enumerate(reps, start=2):
                out_ch = chans[stage_i - 2]
                x = InvertedResidualK(out_ch, 2, 5, 'batchnorm', self.dtype,
                                      name=f'stage{stage_i}_0')(x, train)
                for bi in range(1, repeats):
                    x = InvertedResidualK(out_ch, 1, 5, 'batchnorm',
                                          self.dtype,
                                          name=f'stage{stage_i}_{bi}')(x,
                                                                       train)
            if self.upto == 'conv5':
                x = nn.Conv(1392, (1, 1), name='conv5', **kw)(x)
                x = nn.relu(norm(self, 'conv5_norm', x, train))
            return x

    batch = 8
    imgs = rng.normal(size=(n_inner, batch, *image_hw, 3)).astype(np.float32)
    stacked = jax.device_put(imgs)

    for upto in ('stem', 'stage2', 'stage3', 'stage4', 'conv5'):
        mod = Prefix(upto=upto)
        pvars = mod.init(jax.random.key(0), jnp.zeros((1, 65, 65, 3)))
        log(f'prefix {upto}: compile+time...')

        def fwd(x, c, mod=mod, pvars=pvars):
            y = mod.apply(pvars, x + c * 1e-6)
            return y.sum().astype(jnp.float32) * 1e-9

        t = scan_time(fwd, stacked, n_inner)
        fl, by = cost_of(
            lambda x: mod.apply(pvars, x), stacked[0])
        report(f'prefix_{upto}', batch, t, fl, by)

    # ---------- full model at batches 8, 16 ----------
    for b in (8, 16):
        imgs = rng.normal(size=(n_inner, b, *image_hw, 3)).astype(np.float32)
        stacked = jax.device_put(imgs)
        log(f'full forward b{b}: compile+time...')

        def fwd(x, c):
            f = model.module.apply(variables, x + c * 1e-6, train=False)
            return (f[0].sum() + f[1].sum()).astype(jnp.float32) * 1e-9

        t = scan_time(fwd, stacked, n_inner)
        fl, by = cost_of(
            lambda x: model.module.apply(variables, x, train=False),
            stacked[0])
        report(f'full_forward', b, t, fl, by)

    print(json.dumps({'all': results}))


if __name__ == '__main__':
    main()
