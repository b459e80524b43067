"""Export CLI: ONNX.

Reference parity: ``src/openpifpaf/export_onnx.py:~30`` — input/output
naming, static input shape, opset pinning.  JAX has no in-tree ONNX
exporter and neither ``onnx`` nor ``jax2onnx`` is installed here, so the
default path is this framework's own serializer
(:mod:`openpifpaf_tpu.onnx_native`): a protobuf wire-format writer plus a
graph builder covering EVERY registered basenet family (ShuffleNetV2/
V2K, ResNet, BotNet incl. its MHSA stage, MobileNetV2/V3, EffNetV2,
SqueezeNet, and the Swin/XCiT/HRFormer transformers) + CompositeField4
heads.  Exports are verified in-tree by parsing the file
back and re-executing it with a numpy/lax interpreter against the flax
forward (``tests/test_onnx_export.py``).

``--via-jax2onnx`` uses the optional ``jax2onnx`` package instead (any
basenet, needs the package installed).  ``export_stablehlo`` remains the
portable native artifact for XLA targets.
"""

from __future__ import annotations

import argparse
import logging
import sys

from . import logger, models

LOG = logging.getLogger(__name__)


def apply(model, outfile: str, *, input_hw=(641, 641)):
    from . import onnx_native

    data = onnx_native.build_model_graph(model, input_hw=input_hw)
    with open(outfile, 'wb') as f:
        f.write(data)
    LOG.info('wrote %s (%d bytes, opset %d)', outfile, len(data),
             onnx_native.OPSET_VERSION)


def apply_jax2onnx(model, outfile: str, *, input_hw=(641, 641),
                   opset: int = 17):
    try:
        import jax2onnx  # pylint: disable=import-outside-toplevel
    except ImportError as e:
        raise RuntimeError(
            '--via-jax2onnx needs the optional jax2onnx package, which is '
            'not installed in this environment; the default native '
            'exporter supports the ShuffleNetV2/V2K families.') from e

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


def verify(model, outfile: str, *, input_hw=(641, 641),
           atol: float = None) -> float:
    """Parse the written artifact back and re-execute it against the flax
    forward on random input (``onnx_native.execute_model``); returns the
    max abs deviation and raises if it exceeds ``atol``.  In-environment
    stand-in for the reference's onnxruntime check
    (``src/openpifpaf/export_onnx.py:~60``).

    The artifact always carries float32 weights; when the flax model
    computes in bfloat16 (the default, ``--no-bf16`` to disable) the
    comparison is f32-interpreter vs bf16-forward, so the default
    tolerance widens to bf16 rounding scale."""
    import jax.numpy as jnp
    import numpy as np

    from . import onnx_native

    if atol is None:
        dtype = getattr(model.module.basenet, 'dtype', jnp.float32)
        atol = 1e-2 if dtype == jnp.bfloat16 else 1e-3

    with open(outfile, 'rb') as f:
        parsed = onnx_native.parse_model(f.read())
    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(1, 3, *input_hw)).astype(np.float32)
    got = onnx_native.execute_model(parsed, {'input': x_nchw})
    # jit the flax forward: eager per-op dispatch is pathological on a
    # tunneled TPU backend (see CLAUDE.md)
    import jax
    fwd = jax.jit(
        lambda x: model.apply(model.variables, x, train=False))
    want = fwd(x_nchw.transpose(0, 2, 3, 1))
    if len(parsed['outputs']) != len(want):
        raise ValueError(
            f"ONNX artifact has {len(parsed['outputs'])} outputs but the "
            f'flax forward produced {len(want)} — a head was dropped by '
            'the graph builder')
    max_dev = 0.0
    for out_info, w in zip(parsed['outputs'], want):
        dev = float(np.abs(got[out_info['name']] - np.asarray(w)).max())
        max_dev = max(max_dev, dev)
    LOG.info('verify: max abs deviation %.2e over %d outputs',
             max_dev, len(parsed['outputs']))
    if max_dev > atol:
        raise ValueError(
            f'ONNX verification failed: max deviation {max_dev:.2e} '
            f'> atol {atol:.0e}')
    return max_dev


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog='python -m openpifpaf_tpu.export_onnx', description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    logger.cli(parser)
    models.Factory.cli(parser)
    parser.add_argument('--outfile', default='openpifpaf_tpu.onnx')
    parser.add_argument('--input-height', default=641, type=int)
    parser.add_argument('--input-width', default=641, type=int)
    parser.add_argument('--opset', default=17, type=int,
                        help='[--via-jax2onnx only] opset version')
    parser.add_argument('--via-jax2onnx', default=False, action='store_true',
                        help='use the optional jax2onnx package instead of '
                             'the native serializer')
    parser.add_argument('--verify', default=False, action='store_true',
                        help='[native exporter] re-execute the written '
                             'artifact with the in-tree interpreter and '
                             'compare against the flax forward')
    args = parser.parse_args(argv)
    logger.configure(args)
    models.Factory.configure(args)

    model = models.Factory().factory()
    input_hw = (args.input_height, args.input_width)
    if args.via_jax2onnx:
        apply_jax2onnx(model, args.outfile, input_hw=input_hw,
                       opset=args.opset)
    else:
        apply(model, args.outfile, input_hw=input_hw)
        if args.verify:
            verify(model, args.outfile, input_hw=input_hw)
    return 0


if __name__ == '__main__':
    sys.exit(main())
