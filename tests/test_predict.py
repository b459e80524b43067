"""Predict CLI integration test (subprocess, like the reference's tests)."""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import PIL.Image
import pytest

from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.plugins.coco import constants

LONG_EDGE = 161


@pytest.fixture(scope='module')
def checkpoint_and_image(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('predict')
    cif = headmeta.Cif('cif', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       pose=constants.COCO_UPRIGHT_POSE,
                       draw_skeleton=constants.COCO_PERSON_SKELETON,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'cocokp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       pose=constants.COCO_UPRIGHT_POSE,
                       skeleton=constants.COCO_PERSON_SKELETON)
    factory = models.Factory(base_name='shufflenetv2k16', bf16=False)
    model = factory.from_scratch('shufflenetv2k16', [cif, caf])
    model.init(jax.random.key(0))
    ckpt = tmp / 'model.npz'
    models.checkpoint.save(
        str(ckpt), variables=jax.tree.map(np.asarray, model.variables),
        head_metas=model.head_metas, basenet_name='shufflenetv2k16',
        base_stride=16)

    rng = np.random.default_rng(0)
    img = tmp / 'image.jpg'
    PIL.Image.fromarray(
        rng.integers(0, 255, (90, 140, 3), np.uint8), 'RGB').save(str(img))
    return str(ckpt), str(img)


def _run_cli(args):
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''     # disable TPU tunnel registration
    env['JAX_PLATFORMS'] = 'cpu'
    return subprocess.run(
        [sys.executable, '-m', 'openpifpaf_tpu.predict'] + args,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=600)


def test_predict_json(checkpoint_and_image, tmp_path):
    ckpt, img = checkpoint_and_image
    out = str(tmp_path / 'out.json')
    result = _run_cli([img, '--checkpoint', ckpt, '--json-output', out,
                       '--long-edge', str(LONG_EDGE), '--no-bf16'])
    assert result.returncode == 0, result.stderr
    with open(out) as f:
        data = json.load(f)
    assert isinstance(data, list)
    for ann in data:
        assert set(ann) >= {'keypoints', 'bbox', 'score', 'category_id'}


def test_predict_debug_checks(checkpoint_and_image, tmp_path):
    """--debug-checks routes decode through per-image checkify programs;
    on clean inputs the CLI must behave identically."""
    ckpt, img = checkpoint_and_image
    out = str(tmp_path / 'out.json')
    result = _run_cli([img, '--checkpoint', ckpt, '--json-output', out,
                       '--long-edge', str(LONG_EDGE), '--no-bf16',
                       '--debug-checks'])
    assert result.returncode == 0, result.stderr
    with open(out) as f:
        assert isinstance(json.load(f), list)


def test_predict_image_output(checkpoint_and_image, tmp_path):
    ckpt, img = checkpoint_and_image
    out = str(tmp_path / 'out.jpg')
    result = _run_cli([img, '--checkpoint', ckpt, '--image-output', out,
                       '--long-edge', str(LONG_EDGE), '--no-bf16'])
    assert result.returncode == 0, result.stderr
    assert os.path.exists(out)


def test_predict_multi_scale(checkpoint_and_image, tmp_path):
    ckpt, img = checkpoint_and_image
    out = str(tmp_path / 'ms.json')
    result = _run_cli([img, '--checkpoint', ckpt, '--json-output', out,
                       '--long-edge', str(LONG_EDGE), '--multi-scale',
                       '--multi-scale-factors', '0.8', '1.0'])
    assert result.returncode == 0, result.stderr[-2000:]
    with open(out) as f:
        preds = json.load(f)
    assert isinstance(preds, list)
