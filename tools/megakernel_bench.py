"""Megakernel pilot bench: pallas fused pair-chain vs the XLA pair plan.

VERDICT r4 #1: measure whether holding a stride-1 block chain's
activations in VMEM (``ops/pallas_pair_chain.py``) beats the production
XLA pair plan on the stage shapes of the 641px/batch-8 bench config.

Timing discipline (CLAUDE.md): data-dependent scan chains (the output
pair feeds the next iteration), subtract the noop floor, report the
median of N_CALLS; TPU-tunnel numbers are relative indicators.

Run ON TPU from the repo root:  python tools/megakernel_bench.py
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

B = 8
N_INNER = 8
N_CALLS = 5

# (name, spatial, half_width, stage index, stride-1 block ids at 641px)
STAGES = [
    ('stage2', 161, 174, 2, (1, 2, 3)),
    ('stage3', 81, 348, 3, (1, 2, 3, 4, 5, 6, 7)),
    ('stage4', 41, 696, 4, (1, 2, 3)),
]


def scan_chain_time(fn, a, b):
    """Median seconds per fn(a, b) application, data-dependent chain."""
    import jax

    @jax.jit
    def chain(pair):
        def body(c, _):
            return fn(*c), ()
        out, _ = jax.lax.scan(body, pair, None, length=N_INNER)
        return out

    pair = (a, b)
    out = chain(pair)
    jax.block_until_ready(out)
    times = []
    for _ in range(N_CALLS):
        start = time.perf_counter()
        out = chain(pair)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - start) / N_INNER)
    return statistics.median(times)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--stages', nargs='+',
                        default=[s[0] for s in STAGES])
    parser.add_argument('--out', default='/tmp/megakernel.json')
    parser.add_argument('--skip-xla', action='store_true',
                        help='skip the XLA chain timings (use when the '
                             'tunnel compile server wedges on them; the '
                             'pallas parity reference still compiles as '
                             'a single jitted call)')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from openpifpaf_tpu import headmeta, models
    from openpifpaf_tpu.models import fused_shufflenet as fs
    from openpifpaf_tpu.ops import pallas_pair_chain as ppc
    from openpifpaf_tpu.plugins.coco import constants

    print('devices:', jax.devices(), file=sys.stderr, flush=True)

    cif = headmeta.Cif('cif', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS)
    caf = headmeta.Caf('caf', 'cocokp', keypoints=constants.COCO_KEYPOINTS,
                      sigmas=constants.COCO_PERSON_SIGMAS,
                      skeleton=constants.COCO_PERSON_SKELETON)
    model = models.Factory(base_name='shufflenetv2k16',
                           bf16=True).from_scratch('shufflenetv2k16',
                                                   [cif, caf])
    model.init(jax.random.key(0), input_hw=(65, 65))
    variables = model.variables

    # randomize BN stats so folds are nontrivial
    rng = np.random.default_rng(0)

    def perturb(path, x):
        name = path[-1].key if hasattr(path[-1], 'key') else str(path[-1])
        x = np.asarray(x)
        if name == 'mean':
            return x + rng.normal(0, 0.3, x.shape).astype(np.float32)
        if name == 'var':
            return (x * rng.uniform(0.5, 2.0, x.shape)).astype(np.float32)
        return x

    variables = jax.tree_util.tree_map_with_path(perturb, variables)

    # noop floor
    tiny = jnp.zeros((4, 128), jnp.float32)
    floor = scan_chain_time(
        lambda x, y: (x * 1.000001, y * 1.000001), tiny, tiny)
    print(f'noop floor: {floor * 1e3:.3f} ms/call', file=sys.stderr, flush=True)

    results = {'floor_ms': floor * 1e3}
    for name, hw, half, stage_i, block_ids in STAGES:
        if name not in args.stages:
            continue
        p = variables['params']['basenet']
        s = variables['batch_stats']['basenet']
        blocks = [ppc.block_params(p[f'stage{stage_i}_{i}'],
                                   s[f'stage{stage_i}_{i}'])
                  for i in block_ids]
        data = np.abs(rng.normal(
            0, 0.5, (2, B, hw, hw, half))).astype(np.float32)
        a = jnp.asarray(data[0], jnp.bfloat16)
        b = jnp.asarray(data[1], jnp.bfloat16)

        # production XLA pair plan chain (flax-BN math)
        def xla_plan(aa, bb, _p=p, _s=s, _si=stage_i, _ids=block_ids):
            pair = (aa, bb)
            for i in _ids:
                pair = fs._block_stride1_pair(
                    pair, _p[f'stage{_si}_{i}'], _s[f'stage{_si}_{i}'],
                    jnp.bfloat16)
            return pair

        # folded-BN XLA reference (isolates the BN-fold advantage)
        def xla_folded(aa, bb, _blocks=blocks):
            return ppc.pair_chain_reference(aa, bb, _blocks,
                                            dtype=jnp.bfloat16)

        if args.skip_xla:
            t_xla = t_folded = float('nan')
        else:
            t_xla = scan_chain_time(xla_plan, a, b)
            t_folded = scan_chain_time(xla_folded, a, b)

        entry = {
            'hw': hw, 'half': half, 'n_blocks': len(block_ids),
            'xla_plan_ms_img': (t_xla - floor) * 1e3 / B,
            'xla_folded_ms_img': (t_folded - floor) * 1e3 / B,
            'pallas': {},
        }

        ref_a, ref_b = jax.jit(xla_folded)(a, b)
        for n_bands in (1, 2, 4, 8):
            tile_rows = -(-hw // n_bands) + 4 * len(block_ids)
            vmem_est = (tile_rows * hw * half * 2 * 2      # in pair
                        + (-(-hw // n_bands)) * hw * half * 2 * 2) * 2e-6
            try:
                def pallas_fn(aa, bb, _blocks=blocks, _nb=n_bands):
                    return ppc.pair_chain_pallas(aa, bb, _blocks,
                                                 n_bands=_nb,
                                                 dtype=jnp.bfloat16)

                got_a, got_b = jax.jit(pallas_fn)(a, b)
                err = max(
                    float(jnp.max(jnp.abs(got_a.astype(jnp.float32)
                                          - ref_a.astype(jnp.float32)))),
                    float(jnp.max(jnp.abs(got_b.astype(jnp.float32)
                                          - ref_b.astype(jnp.float32)))))
                t_pallas = scan_chain_time(pallas_fn, a, b)
                entry['pallas'][n_bands] = {
                    'ms_img': (t_pallas - floor) * 1e3 / B,
                    'max_err_vs_folded': err,
                }
                print(f'{name} bands={n_bands}: '
                      f'{(t_pallas - floor) * 1e3 / B:.3f} ms/img '
                      f'(xla plan {(t_xla - floor) * 1e3 / B:.3f}) '
                      f'err={err:.2e}', file=sys.stderr, flush=True)
            except Exception as exc:  # VMEM OOM etc: record and move on
                entry['pallas'][n_bands] = {
                    'error': f'{type(exc).__name__}: {str(exc)[:300]}',
                    'vmem_est_mb_tiles': vmem_est}
                print(f'{name} bands={n_bands}: FAILED '
                      f'{type(exc).__name__} (tiles ~{vmem_est:.1f} MB)',
                      file=sys.stderr, flush=True)
        results[name] = entry

    out_path = args.out
    with open(out_path, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
