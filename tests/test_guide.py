"""Execute the guide scripts — living documentation as integration tests.

Mirrors the reference's ``tests/test_guide.py`` (nbval over
``guide/*.ipynb``, SURVEY.md §4): every documented workflow must keep
running.
"""

import glob
import os
import subprocess
import sys

import pytest

GUIDE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'guide')
GUIDES = sorted(glob.glob(os.path.join(GUIDE_DIR, '*.py')))


def test_guides_exist():
    assert len(GUIDES) >= 5


@pytest.mark.parametrize('script', GUIDES,
                         ids=[os.path.basename(g) for g in GUIDES])
def test_guide_runs(script):
    env = dict(os.environ)
    env['PALLAS_AXON_POOL_IPS'] = ''
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    env['MPLBACKEND'] = 'Agg'
    # scripts run with sys.path[0] = guide/; make the package importable
    env['PYTHONPATH'] = os.path.dirname(GUIDE_DIR)
    proc = subprocess.run(
        [sys.executable, script],
        cwd=os.path.dirname(GUIDE_DIR), env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert 'OK' in proc.stdout
