"""Smoke tests for the observability/tooling CLIs: logs, count_ops, benchmark.

Reference parity: the reference ships ``logs.py`` (train-log plots,
``:~30``), ``count_ops.py`` (GMACs/params) and ``benchmark.py``
(eval-over-checkpoints markdown table) as part of its CLI suite
(SURVEY.md §2.6).
"""

import json
import os
import subprocess
import sys

import pytest


def _run_cli(module, args, timeout=540):
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    env['MPLBACKEND'] = 'Agg'
    return subprocess.run(
        [sys.executable, '-m', module] + args,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=timeout)


def test_logs_plots(tmp_path):
    log = tmp_path / 'train.log'
    lines = []
    for epoch in range(3):
        for batch in range(4):
            lines.append({'type': 'train', 'epoch': epoch, 'batch': batch,
                          'n_batches': 4, 'time': 0.1, 'lr': 1e-3,
                          'loss': 3.0 - epoch - 0.1 * batch,
                          'head_losses': [1.0, 1.0, 1.0 - 0.1 * epoch]})
        lines.append({'type': 'train-epoch', 'epoch': epoch + 1,
                      'loss': 2.5 - epoch, 'time': 1.0})
        lines.append({'type': 'val-epoch', 'epoch': epoch + 1,
                      'loss': 2.7 - epoch,
                      'head_losses': [1.0, 1.0, 0.9], 'time': 0.2})
    log.write_text('\n'.join(json.dumps(l) for l in lines))

    out = tmp_path / 'plot.png'
    result = _run_cli('openpifpaf_tpu.logs', [str(log), '-o', str(out)])
    assert result.returncode == 0, result.stderr[-2000:]
    assert out.exists() and out.stat().st_size > 0


def test_count_ops(tmp_path):
    result = _run_cli('openpifpaf_tpu.count_ops',
                      ['--basenet=shufflenetv2k16', '--long-edge=81',
                       '--no-bf16'])
    assert result.returncode == 0, result.stderr[-2000:]
    assert 'GMACs' in result.stdout and 'params' in result.stdout, \
        result.stdout


def test_benchmark_help():
    result = _run_cli('openpifpaf_tpu.benchmark', ['--help'])
    assert result.returncode == 0
    assert '--checkpoints' in result.stdout


def test_benchmark_format_table():
    from openpifpaf_tpu.benchmark import format_table

    rows = [{'checkpoint': 'a.npz', 'size': 36_000_000,
             'stats': {'text_labels': ['AP', 'AP0.5'], 'stats': [0.7, 0.9],
                       'total_time': 12.3, 'decoder_time': 1.2}}]
    table = format_table(rows)
    assert '| checkpoint | AP | AP0.5 |' in table
    assert '| a.npz | 70.0 | 90.0 | 12.3s | 1.2s | 36.0MB |' in table
    assert format_table([]) == '(no results)'


@pytest.mark.skipif(not os.path.exists('/tmp/toykp_model.npz'),
                    reason='needs a locally trained toykp checkpoint')
def test_benchmark_functional(tmp_path):
    result = _run_cli(
        'openpifpaf_tpu.benchmark',
        ['--checkpoints', '/tmp/toykp_model.npz', '--dataset=toykp',
         f'--output-dir={tmp_path}', '--toykp-image-size=97',
         '--batch-size=8'])
    assert result.returncode == 0, result.stderr[-2000:]
    assert '| checkpoint |' in result.stdout
