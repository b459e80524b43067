"""Export CLI: CoreML (gated on coremltools being installed).

Reference parity: ``src/openpifpaf/export_coreml.py`` — optional Apple
CoreML export.  There is no JAX->CoreML converter in this environment;
when ``coremltools`` is available the model is routed through StableHLO ->
(user-supplied converter); otherwise this CLI fails with a pointer to
``export_stablehlo``, the portable first-class artifact.
"""

from __future__ import annotations

import argparse
import logging
import sys

from . import logger, models

LOG = logging.getLogger(__name__)


def apply(model, outfile: str, *, input_hw=(641, 641)):
    try:
        import coremltools  # noqa: F401  pylint: disable=import-outside-toplevel
    except ImportError as e:
        raise RuntimeError(
            'CoreML export needs the optional coremltools package, which is '
            'not installed in this environment. Use '
            'python -m openpifpaf_tpu.export_stablehlo for the portable '
            'native artifact.') from e
    raise NotImplementedError(
        'coremltools has no direct StableHLO importer; export via '
        'export_onnx (jax2onnx) and convert the ONNX file with '
        'coremltools.converters.onnx')


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.export_coreml', description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    logger.cli(parser)
    models.Factory.cli(parser)
    parser.add_argument('--outfile', default='openpifpaf_tpu.mlmodel')
    parser.add_argument('--input-height', default=641, type=int)
    parser.add_argument('--input-width', default=641, type=int)
    args = parser.parse_args(argv)
    logger.configure(args)
    models.Factory.configure(args)

    try:
        # gate on coremltools before paying for model construction
        import coremltools  # noqa: F401  pylint: disable=import-outside-toplevel,unused-import
        model = models.Factory().factory()
        apply(model, args.outfile,
              input_hw=(args.input_height, args.input_width))
    except (ImportError, RuntimeError, NotImplementedError) as e:
        LOG.error('CoreML export unavailable: %s — use '
                  'python -m openpifpaf_tpu.export_stablehlo', e)
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
