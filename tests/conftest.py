"""Test configuration: force CPU with a virtual 8-device mesh.

Mirrors the reference's CI strategy (tests run without accelerators) and
adds what the reference lacks (SURVEY.md §4): a fake multi-device harness so
sharding/collective code paths are exercised on every test run.

Note: this environment's TPU tunnel (axon sitecustomize) pins
``jax_platforms`` via ``jax.config.update`` at interpreter start, so setting
the env var is not enough — we override through the config API before any
JAX computation runs.
"""

import os

xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: long-running integration test (deselect with '
        '-m "not slow")')
