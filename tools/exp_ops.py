"""Round-3 op-level experiments at ShuffleNetV2k16 stage-2 shape.

Isolates where the 5x HBM-traffic inflation in the backbone lives:
depthwise-conv lowering, channel shuffle relayout, split/concat relayout,
or lane padding.  Also tests a space-to-depth stem rewrite.

Run from the repo root on the tunneled TPU:  python tools/exp_ops.py
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


def log(msg):
    print(f'[exp +{time.perf_counter() - _T0:7.1f}s] {msg}',
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
    from flax import linen as nn

    rng = np.random.default_rng(0)
    results = []

    def run(name, fn, x_shape, dtype=jnp.bfloat16):
        x = jnp.asarray(
            rng.normal(size=(8, B) + x_shape).astype(np.float32), dtype)
        log(f'{name}: compile+time...')
        t = scan_time(lambda xx, c: fn(xx + c.astype(dtype) * 1e-6), x)
        fl, by = cost_of(fn, x[0])
        row = {'name': name, 'ms_per_img': round(t / B * 1e3, 4),
               'gflop_img': round(fl / B / 1e9, 3),
               'mb_img': round(by / B / 1e6, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    H = 161
    C = 174

    # (a) depthwise 5x5 via feature_group_count
    wd = jnp.asarray(rng.normal(size=(5, 5, 1, C)).astype(np.float32),
                     jnp.bfloat16)

    def dw_fgc(x):
        y = jax.lax.conv_general_dilated(
            x, wd, (1, 1), 'SAME', feature_group_count=C,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y.sum().astype(jnp.float32) * 1e-9

    run('dw5x5_fgc', dw_fgc, (H, H, C))

    # (b) depthwise 5x5 as 25 shifted adds (pad + slice, fused elementwise)
    def dw_taps(x):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = jnp.zeros_like(x)
        for di in range(5):
            for dj in range(5):
                acc = acc + xp[:, di:di + H, dj:dj + H, :] * wd[di, dj, 0]
        return acc.sum().astype(jnp.float32) * 1e-9

    run('dw5x5_taps', dw_taps, (H, H, C))

    # (c) 1x1 conv C -> C
    w1 = jnp.asarray(rng.normal(size=(C, C)).astype(np.float32) * 0.05,
                     jnp.bfloat16)

    def conv1x1(x):
        return (x @ w1).sum().astype(jnp.float32) * 1e-9

    run('conv1x1', conv1x1, (H, H, C))

    # (d) channel shuffle alone (2C channels)
    def shuffle(x):
        lead = x.shape[:-1]
        y = x.reshape(*lead, 2, C).swapaxes(-1, -2).reshape(*lead, 2 * C)
        return (y * 1.0001).sum().astype(jnp.float32) * 1e-9

    run('shuffle', shuffle, (H, H, 2 * C))

    # (e) split + concat (the block's residual routing)
    def split_concat(x):
        x1 = x[..., :C]
        x2 = x[..., C:]
        y = jnp.concatenate([x2 * 1.5, x1], axis=-1)
        return y.sum().astype(jnp.float32) * 1e-9

    run('split_concat', split_concat, (H, H, 2 * C))

    # (f) full InvertedResidualK stride-1 block
    from openpifpaf_tpu.models.shufflenetv2k import InvertedResidualK
    blk = InvertedResidualK(2 * C, 1, 5, 'batchnorm', jnp.bfloat16)
    bx = jnp.zeros((1, H, H, 2 * C), jnp.bfloat16)
    bvars = blk.init(jax.random.key(0), bx)

    def block(x):
        return blk.apply(bvars, x).sum().astype(jnp.float32) * 1e-9

    run('block_s1', block, (H, H, 2 * C))

    # (g) stems: direct 3x3 s2 conv vs space-to-depth 2x2 conv
    w3 = jnp.asarray(rng.normal(size=(3, 3, 3, 24)).astype(np.float32) * 0.1,
                     jnp.bfloat16)

    def stem_direct(x):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), w3, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y.sum().astype(jnp.float32) * 1e-9

    run('stem_3x3s2', stem_direct, (641, 641, 3), dtype=jnp.float32)

    w22 = jnp.asarray(rng.normal(size=(2, 2, 12, 24)).astype(np.float32) * .1,
                      jnp.bfloat16)

    def stem_s2d(x):
        xb = x.astype(jnp.bfloat16)
        xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))  # 643
        xp = xp[:, :642, :642, :]
        n, h, w, c = xp.shape
        xs = xp.reshape(n, h // 2, 2, w // 2, 2, c).transpose(
            0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        y = jax.lax.conv_general_dilated(
            xs, w22, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y.sum().astype(jnp.float32) * 1e-9

    run('stem_s2d_2x2', stem_s2d, (641, 641, 3), dtype=jnp.float32)

    print(json.dumps({'all': results}))


if __name__ == '__main__':
    main()
