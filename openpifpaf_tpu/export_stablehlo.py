"""Export CLI: serialize the compiled forward program (StableHLO).

Reference parity: ``src/openpifpaf/export_onnx.py:~30`` /
``export_torchscript.py:~20`` — the reference exports the network to
portable inference artifacts.  The TPU-native equivalent is ``jax.export``:
the jitted forward (optionally with the on-device decoder chained on) is
lowered to StableHLO and serialized; the artifact reloads with
``jax.export.deserialize`` on any platform XLA targets (TPU/GPU/CPU) with
no Python model code.

Usage::

    python -m openpifpaf_tpu.export_stablehlo --checkpoint model.npz \
        --input-height 641 --input-width 641 --outfile model.stablehlo
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

from . import logger, models

LOG = logging.getLogger(__name__)


def export_forward(model, input_hw, *, batch_size: int = 1,
                   include_decoder: bool = False, dynamic_batch: bool = False):
    """Lower the forward (and optionally decode) step to a jax Exported."""
    import jax
    from jax import export as jax_export

    variables = jax.tree.map(np.asarray, model.variables)

    if include_decoder:
        from . import decoder as decoder_mod
        from .decoder.cifcaf import CifCaf

        dec = decoder_mod.factory(model.head_metas)
        if not isinstance(dec, CifCaf):
            raise ValueError('--include-decoder supports CifCaf models only')
        config = dec.config_for(input_hw)
        from .ops import make_batch_decoder
        decode = make_batch_decoder(cif_meta=dec.cif_meta,
                                    caf_meta=dec.caf_meta, config=config)

        def fn(images):
            fields = model.module.apply(variables, images, train=False)
            return tuple(decode(fields[dec.cif_meta.head_index],
                                fields[dec.caf_meta.head_index]))
    else:
        def fn(images):
            return tuple(model.module.apply(variables, images, train=False))

    import jax.numpy as jnp

    if dynamic_batch:
        b = jax_export.symbolic_shape('b')[0]
        spec = jax.ShapeDtypeStruct((b, *input_hw, 3), jnp.float32)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, *input_hw, 3), jnp.float32)
    exported = jax_export.export(jax.jit(fn))(spec)
    return exported


def load_exported(path: str):
    """Deserialize an exported artifact; returns the callable Exported."""
    from jax import export as jax_export

    with open(path, 'rb') as f:
        return jax_export.deserialize(bytearray(f.read()))


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.export_stablehlo',
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    logger.cli(parser)
    models.Factory.cli(parser)
    parser.add_argument('--outfile', default='openpifpaf_tpu.stablehlo')
    parser.add_argument('--input-height', default=641, type=int)
    parser.add_argument('--input-width', default=641, type=int)
    parser.add_argument('--batch-size', default=1, type=int)
    parser.add_argument('--dynamic-batch', default=False, action='store_true',
                        help='export with a symbolic batch dimension')
    parser.add_argument('--include-decoder', default=False,
                        action='store_true',
                        help='chain the on-device CifCaf decode into the '
                             'exported program')
    args = parser.parse_args(argv)
    logger.configure(args)
    models.Factory.configure(args)

    model = models.Factory().factory()
    from .models.tracking_base import TrackingModel
    if isinstance(model, TrackingModel) and args.batch_size % 2:
        LOG.warning('tracking models consume interleaved frame pairs; '
                    'raising --batch-size %d -> %d', args.batch_size,
                    args.batch_size + 1)
        args.batch_size += 1
    exported = export_forward(
        model, (args.input_height, args.input_width),
        batch_size=args.batch_size, include_decoder=args.include_decoder,
        dynamic_batch=args.dynamic_batch)

    blob = exported.serialize()
    with open(args.outfile, 'wb') as f:
        f.write(blob)
    LOG.info('wrote %s (%d bytes, platforms %s)', args.outfile, len(blob),
             exported.platforms)
    print(f'{args.outfile}: {len(blob)} bytes')
    return 0


if __name__ == '__main__':
    sys.exit(main())
