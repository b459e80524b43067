"""Scaling benchmark CLI: weak-scaling efficiency over the device mesh.

BASELINE parity: the reference's scaling story is DDP over NCCL with no
in-tree measurement harness; here the three BASELINE configs (1 chip,
1 host, N hosts) are measured with one command.  Prints one json line per
mesh size plus a summary efficiency line.

Usage: ``python -m openpifpaf_tpu.benchmark_scaling --devices 1 2 4 8``
(on CPU, set ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to
exercise the virtual mesh).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from . import logger

LOG = logging.getLogger(__name__)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.benchmark_scaling',
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    logger.cli(parser)
    parser.add_argument('--devices', default=None, nargs='+', type=int,
                        help='mesh sizes to measure (default: 1..all)')
    parser.add_argument('--batch-per-device', default=2, type=int)
    parser.add_argument('--image-size', default=65, type=int)
    parser.add_argument('--basenet', default='shufflenetv2k16')
    parser.add_argument('--iters', default=5, type=int)
    args = parser.parse_args(argv)
    logger.configure(args)

    import jax

    from .parallel import scaling

    n_avail = jax.device_count()
    counts = args.devices or sorted({1, 2, n_avail} & set(
        range(1, n_avail + 1)))
    counts = [c for c in counts if c <= n_avail]
    LOG.info('measuring mesh sizes %s (%d devices available)', counts,
             n_avail)

    points = scaling.sweep(
        counts, image_hw=(args.image_size, args.image_size),
        batch_per_device=args.batch_per_device, basenet=args.basenet,
        n_iters=args.iters)
    t1 = points[0].step_time_s if points else 0.0
    for p in points:
        # sharding_overhead = t(n) / (n * t(1)) - 1: the cost of the
        # collectives/partitioner over perfect time-multiplexing — the
        # meaningful metric when virtual devices share one host (see
        # SCALING.md); `efficiency` (t(1)/t(n)) is the real-hardware
        # weak-scaling number.
        overhead = (p.step_time_s / (p.n_devices * t1) - 1.0) if t1 else 0.0
        print(json.dumps({
            'devices': p.n_devices, 'global_batch': p.global_batch,
            'step_ms': round(p.step_time_s * 1000, 2),
            'images_per_s': round(p.images_per_s, 2),
            'efficiency': round(p.efficiency, 3),
            'sharding_overhead': round(overhead, 3),
        }))
    if len(points) > 1:
        print(json.dumps({
            'metric': 'scaling_efficiency',
            'value': round(points[-1].efficiency, 3),
            'unit': f'fraction at {points[-1].n_devices} devices',
            'vs_baseline': round(points[-1].efficiency / 0.8, 2),
        }))
    return 0


if __name__ == '__main__':
    sys.exit(main())
