"""Count ops CLI: GMACs and parameter counts.

Reference parity: ``src/openpifpaf/count_ops.py:~10`` — the reference uses
thop-style counting; here the numbers come straight from XLA's cost
analysis of the compiled forward program (exact, includes fusion).

Usage: ``python -m openpifpaf_tpu.count_ops --basenet shufflenetv2k16``
"""

from __future__ import annotations

import argparse
import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np

from . import logger, models
from .parallel.dryrun import build_tiny_model

LOG = logging.getLogger(__name__)


def count(model, image_hw=(641, 641)) -> dict:
    x = jnp.zeros((1, *image_hw, 3), jnp.float32)

    def forward(variables, x):
        return model.module.apply(variables, x, train=False)

    lowered = jax.jit(forward).lower(model.variables, x)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # older jax returns one dict per device
        analysis = analysis[0]
    flops = float(analysis.get('flops', 0.0))
    n_params = model.num_params()
    return {
        'gflops': flops / 1e9,
        'gmacs': flops / 2e9,
        'million_params': n_params / 1e6,
        'image_hw': list(image_hw),
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.count_ops', description=__doc__)
    logger.cli(parser)
    models.Factory.cli(parser)
    parser.add_argument('--long-edge', default=641, type=int)
    args = parser.parse_args(argv)
    logger.configure(args)
    models.Factory.configure(args)

    factory = models.Factory()
    if factory.checkpoint:
        model = factory.factory()
    else:
        model, _ = build_tiny_model(factory.base_name or 'shufflenetv2k16')
        model.init(jax.random.key(0))

    stats = count(model, (args.long_edge, args.long_edge))
    print(f'GMACs: {stats["gmacs"]:.2f}')
    print(f'GFLOPs: {stats["gflops"]:.2f}')
    print(f'params: {stats["million_params"]:.2f}M')
    return 0


if __name__ == '__main__':
    sys.exit(main())
