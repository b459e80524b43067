"""Eval CLI integration test (subprocess, like the reference's tests).

Reference parity: ``src/openpifpaf/eval.py:~200`` writes a
``*.stats.json`` with the metric stats plus total/decoder time accounting;
this pins the same contract for the TPU build on the synthetic toykp
datamodule (untrained model — AP may be 0, the schema must hold).
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from openpifpaf_tpu import headmeta, models
from openpifpaf_tpu.plugins.coco import constants


@pytest.fixture(scope='module')
def checkpoint(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('eval')
    cif = headmeta.Cif('cif', 'toykp',
                       keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       pose=constants.COCO_UPRIGHT_POSE,
                       draw_skeleton=constants.COCO_PERSON_SKELETON,
                       score_weights=constants.COCO_PERSON_SCORE_WEIGHTS)
    caf = headmeta.Caf('caf', 'toykp',
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
    return str(ckpt)


def test_eval_cli_multi_scale(checkpoint, tmp_path):
    """--multi-scale eval: per-(scale, hflip) variant loaders + OKS merge
    (reference transforms/multi_scale.py:~10). Schema must match the
    single-scale stats contract."""
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    out = tmp_path / 'run_ms'
    proc = subprocess.run(
        [sys.executable, '-m', 'openpifpaf_tpu.eval',
         '--dataset=toykp', f'--checkpoint={checkpoint}',
         '--toykp-image-size=97', '--batch-size=4',
         '--multi-scale', '--multi-scale-factors', '0.75', '1.0',
         '-o', str(out)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    with open(str(out) + '.stats.json') as f:
        stats = json.load(f)
    assert stats['n_images'] == 8
    assert stats['text_labels'][:3] == ['AP', 'AP0.5', 'AP0.75']
    assert 'multi-scale eval over 4 variants' in (proc.stdout + proc.stderr)


def test_eval_cli_stats_schema(checkpoint, tmp_path):
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    out = tmp_path / 'run'
    proc = subprocess.run(
        [sys.executable, '-m', 'openpifpaf_tpu.eval',
         '--dataset=toykp', f'--checkpoint={checkpoint}',
         '--toykp-image-size=97', '--batch-size=4',
         '-o', str(out), '--write-predictions', '--loader-warmup=0.1'],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]

    stats_file = str(out) + '.stats.json'
    assert os.path.exists(stats_file)
    with open(stats_file) as f:
        stats = json.load(f)
    for key in ('n_images', 'total_time', 'nn_time', 'decoder_time',
                'images_per_second', 'stats', 'text_labels'):
        assert key in stats, key
    assert stats['n_images'] == 8
    assert stats['text_labels'][:3] == ['AP', 'AP0.5', 'AP0.75']
    assert len(stats['stats']) == len(stats['text_labels'])
    for value in stats['stats']:
        assert -1.0 <= value <= 1.0
    assert 'AP' in proc.stdout
