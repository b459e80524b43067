"""500-scene crowd-density drift report: production decode vs oracle.

Writes DRIFT.md (per-density-bucket agreement tables) and prints the
aggregate JSON.  See ``tests/drift_harness.py`` for the methodology; the
CI gate over a smaller scene set is ``tests/test_drift.py``.

Run from the repo root (CPU; ~10 min on 2 cores):

    python tools/drift_report.py [--scenes 500] [--out DRIFT.md]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault('XLA_FLAGS', '--xla_force_host_platform_device_count=1')
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', 'tests'))

import jax  # noqa: E402
jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402

import drift_harness as dh  # noqa: E402

BUCKETS = ((5, 15), (16, 30), (31, 60))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--scenes', type=int, default=500)
    parser.add_argument('--out', default='DRIFT.md')
    parser.add_argument('--force-complete', action='store_true')
    parser.add_argument('--noise', action='store_true',
                        help='field-level realism noise (confidence jitter, '
                             'offset/scale noise, spurious blobs, '
                             'near-threshold seeds)')
    parser.add_argument('--max-poses', type=int, default=None,
                        help='pose-slot budget (default 128, or 256 with '
                             '--noise: duplicate seeds occupy slots before '
                             'seed-claim suppression kills them, see '
                             'drift_harness.harness_config)')
    parser.add_argument('--max-seeds', type=int, default=None,
                        help='seed budget (default 1024; wholebody 4096)')
    parser.add_argument('--spec', default='coco',
                        choices=('coco', 'wholebody'),
                        help='keypoint family (wholebody: 133 kp/129 edges, '
                             'VERDICT r3 #7)')
    parser.add_argument('--max-density', type=int, default=None,
                        help='max poses per scene (default 60; wholebody '
                             'default 16 -- 133-kp scenes saturate the '
                             '61x61 grid much earlier)')
    args = parser.parse_args()

    spec = (dh.wholebody_spec() if args.spec == 'wholebody'
            else dh.COCO_SPEC)
    max_density = args.max_density or (16 if args.spec == 'wholebody' else 60)
    max_poses = args.max_poses or (256 if args.noise else 128)
    max_seeds = args.max_seeds or (4096 if args.spec == 'wholebody'
                                   else 1024)
    config = dh.harness_config(max_poses=max_poses, max_seeds=max_seeds,
                               force_complete=args.force_complete)
    harness = dh.Harness(config, spec=spec)
    noise = None
    if args.noise:
        # wholebody: COCO-default noise magnitudes sever the deep face/hand
        # chains entirely (both decoders agree on zero poses); milder noise
        # keeps scenes decodable while still jittering across thresholds
        noise = (dh.FieldNoise(conf_logit_sigma=0.35,
                               peak_conf_range=(0.6, 1.0), offset_sigma=0.08,
                               spurious_blobs=60, spurious_caf=60)
                 if args.spec == 'wholebody' else dh.FieldNoise())

    rng = np.random.default_rng(20260819)
    jobs = [(int(rng.integers(2 ** 31)),
             int(rng.integers(max(2, max_density // 12), max_density + 1)))
            for _ in range(args.scenes)]

    t0 = time.perf_counter()
    results = []
    for i, job in enumerate(jobs):
        results.extend(dh.run_scenes(harness, [job], noise=noise))
        if (i + 1) % 50 == 0:
            print(f'{i + 1}/{len(jobs)} scenes '
                  f'({time.perf_counter() - t0:.0f}s)', file=sys.stderr,
                  flush=True)

    overall = dh.aggregate(results)
    buckets = (BUCKETS if max_density >= 60 else
               ((2, max_density // 3),
                (max_density // 3 + 1, 2 * max_density // 3),
                (2 * max_density // 3 + 1, max_density)))
    rows = []
    for lo, hi in buckets:
        bucket = [r for r in results if lo <= r['n_poses'] <= hi]
        if bucket:
            rows.append(((lo, hi), dh.aggregate(bucket)))

    worst = sorted(results, key=lambda r: r['f1'])[:10]

    with open(args.out, 'w') as f:
        f.write('# Decode scheduling drift: production vs sequential '
                'oracle\n\n')
        f.write(
            'Methodology (`tests/drift_harness.py`): randomized synthetic '
            'crowd scenes\n(clustered, scale 8-22, partial occlusion), both '
            'decoders consume the identical\njitted front-end '
            '(`ops.pipeline.decode_front_end`) and identical finalize\n'
            '(`ops.pipeline.finalize_poses`); every deviation below is '
            'growth *scheduling*\n(r5 wave-recycled parallel frontier + '
            'exact seed-claim fixpoint vs the reference\'s\nsequential seed '
            'loop + occupancy grid, `cifcaf.cpp:~140`). Poses matched by\n'
            'OKS >= 0.5 greedily in oracle score order.\n\n')
        f.write(f'- spec: {spec.name} ({spec.n_keypoints} kp, '
                f'{len(spec.skeleton)} edges), scenes: '
                f'{overall["n_scenes"]}, force_complete: '
                f'{args.force_complete}, field_noise: {args.noise}, '
                f'max_poses: {max_poses}, max_seeds: {max_seeds}\n')
        if args.noise:
            f.write(f'- noise spec: {noise}\n')
            f.write('- budget note: since r5 the wave-recycled growth '
                    '(`growth.grow_waves`) gives claimed seeds the '
                    "reference's budget semantics — they never consume "
                    'pose slots — so the r4 slot-exhaustion residual is '
                    'gone (r4: F1 0.9990 at these budgets; r5: 1.0000).  '
                    'Genuine overflow still reports via '
                    '`n_dropped_poses`.\n')
        f.write(f'- generated: seed 20260819, densities uniform up to '
                f'{max_density}\n\n')
        f.write('| density | scenes | oracle poses | parallel poses | '
                'detection F1 | mean OKS | mean |score delta| | joint '
                'agreement |\n')
        f.write('|---|---|---|---|---|---|---|---|\n')

        def row(label, agg):
            f.write(f'| {label} | {agg["n_scenes"]} | {agg["n_oracle"]} | '
                    f'{agg["n_parallel"]} | {agg["detection_f1"]:.4f} | '
                    f'{agg["mean_oks"]:.4f} | {agg["mean_score_delta"]:.4f} '
                    f'| {agg["mean_joint_agreement"]:.4f} |\n')

        for (lo, hi), agg in rows:
            row(f'{lo}-{hi}', agg)
        row('all', overall)

        f.write('\n## Worst 10 scenes by detection F1\n\n')
        f.write('| seed | n_poses | oracle | parallel | matched | F1 | '
                'mean OKS |\n|---|---|---|---|---|---|---|\n')
        for r in worst:
            oks_s = ('-' if not np.isfinite(r['mean_oks'])
                     else f'{r["mean_oks"]:.3f}')
            f.write(f'| {r["seed"]} | {r["n_poses"]} | {r["n_oracle"]} | '
                    f'{r["n_parallel"]} | {r["n_matched"]} | '
                    f'{r["f1"]:.3f} | {oks_s} |\n')

    print(json.dumps(overall))


if __name__ == '__main__':
    main()
