"""Native ONNX export: parse the emitted file and re-execute it.

The exporter (``openpifpaf_tpu/onnx_native.py``) writes ONNX protobuf
bytes with no onnx/jax2onnx dependency.  This harness closes the loop
in-environment: parse the wire format back, re-execute the graph with
the package's reference interpreter (``onnx_native.execute_model`` —
the same one ``export_onnx --verify`` uses), and compare against the
flax forward on random input, for EVERY registered basenet family.
Also drives the export CLI as a subprocess.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.onnx_native import (
    build_model_graph, parse_model,
    execute_model as onnx_native_execute_model)
from openpifpaf_tpu.plugins.coco import constants


# the interpreter lives in the package (export_onnx --verify uses it);
# this alias keeps the tests' historical name
run_onnx = onnx_native_execute_model


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


def test_cifdet_head_roundtrip():
    """Head emission is meta-generic: a CifDet (detection) head exports
    and re-executes like the keypoint heads."""
    import jax

    cifdet = headmeta.CifDet('cifdet', 'testexport',
                             categories=['person', 'car', 'dog'])
    factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
    model = factory.from_scratch('shufflenetv2k16', [cifdet])
    model.init(jax.random.key(0), input_hw=(49, 49))
    parsed = parse_model(build_model_graph(model, input_hw=(49, 49)))
    rng = np.random.default_rng(0)
    x_nchw = rng.normal(size=(1, 3, 49, 49)).astype(np.float32)
    got = run_onnx(parsed, {'input': x_nchw})
    (want,) = model(x_nchw.transpose(0, 2, 3, 1))
    (out_info,) = parsed['outputs']
    gv = got[out_info['name']]
    assert gv.shape == tuple(np.asarray(want).shape)
    np.testing.assert_allclose(gv, np.asarray(want), atol=2e-4, rtol=1e-3)


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
         '--input-height', '97', '--input-width', '97', '--verify'],
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
