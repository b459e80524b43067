"""Micro-probe: per-op cost inside a pair-plan ShuffleNet block.

At each stage's shape, times chains of (a) 5x5 depthwise convs, (b) 1x1
matmuls (half x half), (c) BN+relu elementwise — to locate the remaining
forward time after the routing elimination.  Relative indicators only
(CLAUDE.md tunnel caveat).  Run: python tools/exp_block_ops.py
"""

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

B = 8
N_INNER = 8
N_CALLS = 5

SHAPES = [  # (name, hw, half_width, n_stride1_blocks)
    ('stage2', 161, 174, 3),
    ('stage3', 81, 348, 7),
    ('stage4', 41, 696, 3),
]


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
        float(carry)
        times.append((time.perf_counter() - start) / N_INNER)
    return statistics.median(times)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    tiny = jnp.zeros((N_INNER, 4, 4), jnp.float32)
    floor = scan_time(lambda x, c: (x[0, 0] + c).sum() * 1.000001, tiny)
    print(json.dumps({'floor_ms_per_image': floor / B * 1e3}), flush=True)

    for name, hw, half, nblocks in SHAPES:
        x = jnp.asarray(rng.normal(size=(B, hw, hw, half))
                        .astype(np.float32)).astype(jnp.bfloat16)
        stacked = jnp.stack([x] * N_INNER)
        k_dw = jnp.asarray(rng.normal(size=(5, 5, 1, half)) * 0.1,
                           jnp.bfloat16)
        w_mm = jnp.asarray(rng.normal(size=(half, half)) * 0.05,
                           jnp.bfloat16)
        scale = jnp.asarray(rng.normal(size=(half,)) * 0.1 + 1.0,
                            jnp.bfloat16)

        # per stride-1 block the pair plan runs: 1 dw + ~1.5 half-matmuls
        # (conv1 fold 0.25C^2 + conv2 0.25C^2 + interleave 0.25C^2) + 3 BN
        def dws(x, c):
            y = x + (c * 1e-6).astype(x.dtype)
            for _ in range(nblocks):
                y = jax.lax.conv_general_dilated(
                    y, k_dw, (1, 1), ((2, 2), (2, 2)),
                    feature_group_count=half,
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return y.astype(jnp.float32).sum() * 1e-9

        def mms(x, c):
            y = x + (c * 1e-6).astype(x.dtype)
            for _ in range(3 * nblocks):
                y = y @ w_mm
            return y.astype(jnp.float32).sum() * 1e-9

        def bns(x, c):
            y = x + (c * 1e-6).astype(x.dtype)
            for _ in range(3 * nblocks):
                y = jax.nn.relu(y * scale + 0.1)
            return y.astype(jnp.float32).sum() * 1e-9

        for opname, fn in (('dw5x5', dws), ('mm_half', mms),
                           ('bn_relu', bns)):
            t = scan_time(fn, stacked)
            print(json.dumps({
                'stage': name, 'op': opname, 'count': (nblocks if
                opname == 'dw5x5' else 3 * nblocks),
                'ms_per_image': round((t - floor) / B * 1e3, 4)}),
                flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
