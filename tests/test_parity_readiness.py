"""Smoke test for tools/parity_when_mounted.py (VERDICT r1 item 9).

The real parity run needs a populated /root/reference; this pins the
machinery now: synthetic torch checkpoints in all three container formats
(raw state dict, {'model': ...}, whole pickled module) convert and load
back to an exactly-equal model.
"""

import importlib.util
import os
import sys

import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'tools', 'parity_when_mounted.py')


@pytest.fixture(scope='module')
def tool():
    spec = importlib.util.spec_from_file_location('parity_when_mounted', TOOL)
    module = importlib.util.module_from_spec(spec)
    # register so pickle can resolve _StateDictCarrier at torch.load time
    sys.modules['parity_when_mounted'] = module
    spec.loader.exec_module(module)
    return module


def test_smoke_all_container_formats(tool):
    results = tool.run_smoke()
    assert set(results) == {'state_dict', 'dict_with_model', 'whole_module',
                            'onnx_verify_max_dev'}
    for name in ('state_dict', 'dict_with_model', 'whole_module'):
        assert results[name] == 0.0, (name, results[name])
    # f32 interpreter vs flax forward on the converted checkpoint
    assert results['onnx_verify_max_dev'] < 1e-3


def test_checkpoint_search_reports_empty_mount(tool):
    found = tool.find_reference_checkpoints()
    # today the mount is empty; the day it is populated this flags that
    # the real parity run (and the copy-check re-run) is now possible
    if found:
        pytest.fail(
            f'reference mount now has checkpoints {found[:3]} — run '
            'tools/parity_when_mounted.py for the real AP parity numbers')
