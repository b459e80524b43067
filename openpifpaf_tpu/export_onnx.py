"""Export CLI: ONNX (gated on an ONNX converter being installed).

Reference parity: ``src/openpifpaf/export_onnx.py:~30`` — opset selection,
input/output naming, optional simplifier.  JAX has no in-tree ONNX
exporter; this CLI uses ``jax2onnx`` when installed and otherwise points at
the portable first-class artifact, ``export_stablehlo`` (StableHLO runs on
any XLA target and is this framework's native export format).
"""

from __future__ import annotations

import argparse
import logging
import sys

from . import logger, models

LOG = logging.getLogger(__name__)


def apply(model, outfile: str, *, input_hw=(641, 641), opset: int = 17):
    try:
        import jax2onnx  # pylint: disable=import-outside-toplevel
    except ImportError as e:
        raise RuntimeError(
            'ONNX export needs the optional jax2onnx package, which is not '
            'installed in this environment. Use '
            'python -m openpifpaf_tpu.export_stablehlo for the portable '
            'native artifact.') from e

    import jax  # pylint: disable=import-outside-toplevel
    import jax.numpy as jnp  # pylint: disable=import-outside-toplevel
    import numpy as np  # pylint: disable=import-outside-toplevel

    variables = jax.tree.map(np.asarray, model.variables)

    def fn(images):
        return tuple(model.module.apply(variables, images, train=False))

    onnx_model = jax2onnx.to_onnx(
        fn, [jax.ShapeDtypeStruct((1, *input_hw, 3), jnp.float32)],
        opset=opset)
    with open(outfile, 'wb') as f:
        f.write(onnx_model.SerializeToString())
    LOG.info('wrote %s', outfile)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.export_onnx', description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    logger.cli(parser)
    models.Factory.cli(parser)
    parser.add_argument('--outfile', default='openpifpaf_tpu.onnx')
    parser.add_argument('--input-height', default=641, type=int)
    parser.add_argument('--input-width', default=641, type=int)
    parser.add_argument('--opset', default=17, type=int)
    args = parser.parse_args(argv)
    logger.configure(args)
    models.Factory.configure(args)

    model = models.Factory().factory()
    apply(model, args.outfile,
          input_hw=(args.input_height, args.input_width), opset=args.opset)
    return 0


if __name__ == '__main__':
    sys.exit(main())
