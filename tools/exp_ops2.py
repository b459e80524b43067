"""Round-3 experiments, part 2: achievable HBM bandwidth + block variants.

1. noop / bigcopy: calibrate the scan-chain floor and the real attainable
   HBM bandwidth of this (tunneled) v5e.
2. stage2-shaped 4-block programs: baseline InvertedResidualK vs
   (a) depthwise-conv-as-taps, (b) "merged-conv" block that eliminates
   split+concat+channel_shuffle by folding the routing permutation into
   the 1x1 convs (timing-equivalent weights), (c) both.
3. stem variants: direct 3x3/s2 conv vs space-to-depth 2x2.

Run from the repo root on the tunneled TPU:  python tools/exp_ops2.py
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
H = 161
C = 348  # stage2 channels


def log(msg):
    print(f'[exp2 +{time.perf_counter() - _T0:7.1f}s] {msg}',
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

    rng = np.random.default_rng(0)
    results = []

    def run(name, fn, x, n_inner=8):
        log(f'{name}: compile+time...')
        t = scan_time(fn, x, n_inner=n_inner)
        row = {'name': name, 'ms_per_iter': round(t * 1e3, 4)}
        results.append(row)
        print(json.dumps(row), flush=True)
        return t

    # --- calibration: noop (pure floor) ---
    tiny = jnp.zeros((8, 8, 8), jnp.float32)
    t_noop = run('noop', lambda x, c: (x[0, 0] + c) * 1.000001, tiny,
                 n_inner=8)

    # --- bigcopy: 256 MB f32 elementwise -> attainable HBM GB/s ---
    big = jnp.asarray(rng.normal(size=(4, 64, 1024, 1024)).astype(np.float32))

    def copyop(x, c):
        y = x * (1.0 + c * 1e-9)
        return y[0, 0, 0] + y[-1, -1, -1]

    t_copy = run('bigcopy_256MB', copyop, big, n_inner=4)
    bytes_moved = 2 * big[0].size * 4
    gbs = bytes_moved / max(t_copy - t_noop, 1e-9) / 1e9
    print(json.dumps({'name': 'hbm_gbs', 'value': round(gbs, 1)}), flush=True)

    # --- block variants: 4 stride-1 stage2 blocks as one program ---
    half = C // 2
    x8 = jnp.asarray(rng.normal(size=(8, B, H, H, C)).astype(np.float32),
                     jnp.bfloat16)

    def mkw(*shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale,
                           jnp.bfloat16)

    wd4 = [mkw(5, 5, 1, half) for _ in range(4)]
    w1a = [mkw(half, half) for _ in range(4)]
    w1b = [mkw(half, half) for _ in range(4)]
    # merged variant weights
    wma = [mkw(C, half) for _ in range(4)]          # conv1 absorbing select
    wmx = [mkw(C, C) for _ in range(4)]             # out-merge: x rows
    wmd = [mkw(half, C) for _ in range(4)]          # out-merge: dw rows

    def bn_relu(x):
        return jax.nn.relu(x * 1.01 + 0.01)

    def dw_fgc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), 'SAME', feature_group_count=x.shape[-1],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))

    def dw_taps(x, w):
        xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
        acc = jnp.zeros_like(x)
        for di in range(5):
            for dj in range(5):
                acc = acc + xp[:, di:di + H, dj:dj + H, :] * w[di, dj, 0]
        return acc

    def shuffle2(x):
        lead = x.shape[:-1]
        y = x.reshape(*lead, 2, half).swapaxes(-1, -2)
        return y.reshape(*lead, C)

    def make_base(dw):
        def blocks(x, c):
            x = x + c.astype(jnp.bfloat16) * 1e-6
            for i in range(4):
                x1 = x[..., :half]
                x2 = x[..., half:]
                b2 = bn_relu(x2 @ w1a[i])
                b2 = dw(b2, wd4[i]) * 1.01 + 0.01
                b2 = bn_relu(b2 @ w1b[i])
                x = shuffle2(jnp.concatenate([x1, b2], axis=-1))
            return x.sum().astype(jnp.float32) * 1e-9
        return blocks

    def make_merged(dw):
        def blocks(x, c):
            x = x + c.astype(jnp.bfloat16) * 1e-6
            for i in range(4):
                b2 = bn_relu(x @ wma[i])            # select+conv1 folded
                b2 = dw(b2, wd4[i]) * 1.01 + 0.01
                # out = perm(concat(x1, conv2(b2))) folded into two matmuls
                x = bn_relu(x @ wmx[i] + b2 @ wmd[i])
            return x.sum().astype(jnp.float32) * 1e-9
        return blocks

    run('blocks4_base_fgc', make_base(dw_fgc), x8)
    run('blocks4_base_taps', make_base(dw_taps), x8)
    run('blocks4_merged_fgc', make_merged(dw_fgc), x8)
    run('blocks4_merged_taps', make_merged(dw_taps), x8)

    # --- stems ---
    xin = jnp.asarray(
        rng.normal(size=(8, B, 641, 641, 3)).astype(np.float32))
    w3 = mkw(3, 3, 3, 24, scale=0.1)
    w22 = mkw(2, 2, 12, 24, scale=0.1)

    def stem_direct(x, c):
        y = jax.lax.conv_general_dilated(
            (x + c * 1e-6).astype(jnp.bfloat16), w3, (2, 2),
            ((1, 1), (1, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y.sum().astype(jnp.float32) * 1e-9

    def stem_s2d(x, c):
        xb = (x + c * 1e-6).astype(jnp.bfloat16)
        xp = jnp.pad(xb, ((0, 0), (1, 0), (1, 0), (0, 0)))[:, :642, :642, :]
        n, h, w, ch = xp.shape
        xs = xp.reshape(n, h // 2, 2, w // 2, 2, ch).transpose(
            0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * ch)
        y = jax.lax.conv_general_dilated(
            xs, w22, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y.sum().astype(jnp.float32) * 1e-9

    run('stem_3x3s2', stem_direct, xin)
    run('stem_s2d_2x2', stem_s2d, xin)

    print(json.dumps({'all': results, 'floor_ms': round(t_noop * 1e3, 3)}))


if __name__ == '__main__':
    main()
