"""Native ONNX export: parse the emitted file and re-execute it.

The exporter (``openpifpaf_tpu/onnx_native.py``) writes ONNX protobuf
bytes with no onnx/jax2onnx dependency.  This harness closes the loop
in-environment: parse the wire format back, run the graph with a small
numpy/lax interpreter implementing the emitted op set (Conv,
BatchNormalization, Relu, Slice, Concat, Reshape, Transpose,
DepthToSpace[CRD]), and compare against the flax forward on random
input.  Also drives the export CLI as a subprocess.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.onnx_native import FLOAT, build_model_graph, parse_model
from openpifpaf_tpu.plugins.coco import constants


# ---------------------------------------------------------------------------
# a tiny ONNX interpreter for the emitted op set
# ---------------------------------------------------------------------------

def run_onnx(model_dict, inputs):
    import jax
    import jax.numpy as jnp

    env = dict(model_dict['initializers'])
    env.update(inputs)

    def conv(x, w, b, attrs):
        strides = tuple(attrs['strides']['ints'])
        pads = attrs['pads']['ints']
        groups = int(attrs['group']['i'])
        dil = tuple(attrs['dilations']['ints']) if 'dilations' in attrs \
            else (1, 1)
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), window_strides=strides,
            padding=((pads[0], pads[2]), (pads[1], pads[3])),
            rhs_dilation=dil,
            feature_group_count=groups,
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
        if b is not None:
            out = out + jnp.asarray(b)[None, :, None, None]
        return np.asarray(out)

    for n in model_dict['nodes']:
        op = n['op_type']
        ins = [env[i] if i else None for i in n['inputs']]
        a = n['attrs']
        if op == 'Conv':
            out = conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
        elif op == 'BatchNormalization':
            x, scale, bias, mean, var = ins
            eps = a['epsilon']['f']
            out = ((x - mean[None, :, None, None])
                   / np.sqrt(var[None, :, None, None] + eps)
                   * scale[None, :, None, None]
                   + bias[None, :, None, None])
        elif op == 'Relu':
            out = np.maximum(ins[0], 0.0)
        elif op == 'Sigmoid':
            out = 1.0 / (1.0 + np.exp(-ins[0].astype(np.float64)))
        elif op == 'Mul':
            out = ins[0] * ins[1]
        elif op == 'GlobalAveragePool':
            out = ins[0].mean(axis=(2, 3), keepdims=True)
        elif op == 'MatMul':
            out = np.matmul(ins[0], ins[1])
        elif op == 'Softmax':
            ax = int(a['axis']['i'])
            e = np.exp(ins[0] - ins[0].max(axis=ax, keepdims=True))
            out = e / e.sum(axis=ax, keepdims=True)
        elif op == 'AveragePool':
            assert int(a['count_include_pad']['i']) == 1
            k = tuple(a['kernel_shape']['ints'])
            s = tuple(a['strides']['ints'])
            p = a['pads']['ints']
            summed = jax.lax.reduce_window(
                jnp.asarray(ins[0]), 0.0, jax.lax.add,
                (1, 1, *k), (1, 1, *s),
                ((0, 0), (0, 0), (p[0], p[2]), (p[1], p[3])))
            out = np.asarray(summed) / float(k[0] * k[1])
        elif op == 'Clip':
            out = np.clip(ins[0], ins[1], ins[2])
        elif op == 'Add':
            out = ins[0] + ins[1]
        elif op == 'MaxPool':
            k = tuple(a['kernel_shape']['ints'])
            s = tuple(a['strides']['ints'])
            p = a['pads']['ints']
            out = np.asarray(jax.lax.reduce_window(
                jnp.asarray(ins[0]), -jnp.inf, jax.lax.max,
                (1, 1, *k), (1, 1, *s),
                ((0, 0), (0, 0), (p[0], p[2]), (p[1], p[3]))))
        elif op == 'Concat':
            out = np.concatenate(ins, axis=int(a['axis']['i']))
        elif op == 'Slice':
            x, starts, ends, axes = ins[:4]
            steps = ins[4] if len(ins) > 4 else np.ones_like(starts)
            slices = [slice(None)] * x.ndim
            for s, e, ax, st in zip(starts, ends, axes, steps):
                e = None if e == np.iinfo(np.int64).max else int(e)
                slices[int(ax)] = slice(int(s), e, int(st))
            out = x[tuple(slices)]
        elif op == 'Sub':
            out = ins[0] - ins[1]
        elif op == 'Div':
            out = ins[0] / ins[1]
        elif op == 'Sqrt':
            out = np.sqrt(ins[0])
        elif op == 'Tanh':
            out = np.tanh(ins[0])
        elif op == 'ReduceSum':
            out = ins[0].sum(axis=tuple(int(i) for i in ins[1]),
                             keepdims=bool(a['keepdims']['i']))
        elif op == 'Gather':
            out = np.take(ins[0], ins[1], axis=int(a['axis']['i']))
        elif op == 'ReduceMean':
            axes = tuple(a['axes']['ints'])
            out = ins[0].mean(axis=axes, keepdims=bool(a['keepdims']['i']))
        elif op == 'Pad':
            assert a['mode']['s'] == 'constant'
            pads, r = ins[1], ins[0].ndim
            out = np.pad(ins[0], [(int(pads[i]), int(pads[i + r]))
                                  for i in range(r)])
        elif op == 'Reshape':
            out = ins[0].reshape([int(d) for d in ins[1]])
        elif op == 'Transpose':
            out = np.transpose(ins[0], a['perm']['ints'])
        elif op == 'DepthToSpace':
            assert a['mode']['s'] == 'CRD'
            b_ = int(a['blocksize']['i'])
            n_, c, h, w = ins[0].shape
            out = ins[0].reshape(n_, c // (b_ * b_), b_, b_, h, w)
            out = out.transpose(0, 1, 4, 2, 5, 3)
            out = out.reshape(n_, c // (b_ * b_), h * b_, w * b_)
        else:
            raise NotImplementedError(op)
        env[n['outputs'][0]] = np.asarray(out, np.float32)

    return {o['name']: env[o['name']] for o in model_dict['outputs']}


def build_model(upsample=1, base='shufflenetv2k16'):
    import jax

    cif = headmeta.Cif('cif', 'testexport',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'testexport',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    cif.upsample_stride = upsample
    caf.upsample_stride = upsample
    factory = models.Factory(base_name=base, bf16=False)
    model = factory.from_scratch(base, [cif, caf])
    model.init(jax.random.key(0), input_hw=(49, 49))
    # random batch stats so batchnorm is a real transform, not identity
    rng = np.random.default_rng(1)
    import jax.numpy as jnp

    def randomize(tree):
        return jax.tree.map(
            lambda x: jnp.asarray(
                rng.uniform(0.5, 1.5, x.shape).astype(np.float32)), tree)
    model.variables = dict(model.variables)
    if 'batch_stats' in model.variables:   # transformer trunks: layernorm
        model.variables['batch_stats'] = randomize(
            model.variables['batch_stats'])
    return model


@pytest.mark.parametrize('upsample', [1, 2])
def test_roundtrip_matches_flax_forward(upsample):
    hw = (49, 49)
    model = build_model(upsample=upsample)
    data = build_model_graph(model, input_hw=hw)
    parsed = parse_model(data)
    assert parsed['opset'] == 13
    assert parsed['inputs'][0]['name'] == 'input'
    assert parsed['inputs'][0]['shape'] == [1, 3, *hw]

    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(1, 3, *hw)).astype(np.float32)
    got = run_onnx(parsed, {'input': x_nchw})

    want = model(x_nchw.transpose(0, 2, 3, 1))
    assert len(got) == len(want) == 2
    for out_info, w in zip(parsed['outputs'], want):
        gv = got[out_info['name']]
        assert gv.shape == tuple(np.asarray(w).shape)
        np.testing.assert_allclose(gv, np.asarray(w), atol=2e-4, rtol=1e-3)


def test_resnet_roundtrip_matches_flax_forward():
    hw = (49, 49)
    model = build_model(base='resnet50')
    parsed = parse_model(build_model_graph(model, input_hw=hw))
    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(1, 3, *hw)).astype(np.float32)
    got = run_onnx(parsed, {'input': x_nchw})
    want = model(x_nchw.transpose(0, 2, 3, 1))
    for out_info, w in zip(parsed['outputs'], want):
        gv = got[out_info['name']]
        assert gv.shape == tuple(np.asarray(w).shape)
        np.testing.assert_allclose(gv, np.asarray(w), atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize('base', ['mobilenetv2', 'squeezenet',
                                  'mobilenetv3large', 'effnetv2s',
                                  'botnet', 'swin_t', 'xcit_small_12',
                                  'hrformer_s', 'shufflenetv2x1'])
def test_mobilenet_squeezenet_roundtrip(base):
    hw = (49, 49)
    model = build_model(base=base)
    parsed = parse_model(build_model_graph(model, input_hw=hw))
    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(1, 3, *hw)).astype(np.float32)
    got = run_onnx(parsed, {'input': x_nchw})
    want = model(x_nchw.transpose(0, 2, 3, 1))
    for out_info, w in zip(parsed['outputs'], want):
        gv = got[out_info['name']]
        assert gv.shape == tuple(np.asarray(w).shape)
        np.testing.assert_allclose(gv, np.asarray(w), atol=3e-4, rtol=1e-3)


def test_unsupported_basenet_raises():
    class FakeModule:
        basenet = object()

    class FakeModel:
        module = FakeModule()

    with pytest.raises(NotImplementedError, match='ShuffleNetV2'):
        build_model_graph(FakeModel(), input_hw=(49, 49))


def test_export_cli(tmp_path):
    import jax

    model = build_model()
    ckpt = tmp_path / 'model.npz'
    models.checkpoint.save(
        str(ckpt), variables=jax.tree.map(np.asarray, model.variables),
        head_metas=model.head_metas, basenet_name='shufflenetv2k16',
        base_stride=16)
    out = tmp_path / 'model.onnx'
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    proc = subprocess.run(
        [sys.executable, '-m', 'openpifpaf_tpu.export_onnx',
         f'--checkpoint={ckpt}', '--outfile', str(out),
         '--input-height', '97', '--input-width', '97'],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    parsed = parse_model(out.read_bytes())
    assert parsed['inputs'][0]['shape'] == [1, 3, 97, 97]
    assert len(parsed['outputs']) == 2
    assert len(parsed['nodes']) > 100


def test_initializer_dtypes_and_layout():
    """Conv weights are OIHW float32; depthwise grouped correctly."""
    model = build_model()
    parsed = parse_model(build_model_graph(model, input_hw=(49, 49)))
    w = parsed['initializers']['basenet.conv1.weight']
    assert w.dtype == np.float32
    assert w.shape == (24, 3, 3, 3)       # (O, I, kH, kW) for sn2k16
    dw = parsed['initializers']['basenet.stage2_0.branch1_dwconv.weight']
    assert dw.shape[1] == 1               # depthwise: I/groups == 1
    conv_nodes = {n['inputs'][1]: n for n in parsed['nodes']
                  if n['op_type'] == 'Conv'}
    assert conv_nodes['basenet.stage2_0.branch1_dwconv.weight'][
        'attrs']['group']['i'] == 24
