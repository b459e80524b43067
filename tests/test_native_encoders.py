"""Native (C++) encoder parity vs the numpy oracle.

The ctypes-bound painting loops in ``csrc/encoders.cpp`` must reproduce the
Python encoders exactly (same reference semantics, ``encoder/cif.py`` /
``encoder/caf.py``); the numpy implementation is the oracle.
"""

import dataclasses

import numpy as np
import pytest

from openpifpaf_tpu import headmeta
from openpifpaf_tpu.encoder import CafEncoder, CifEncoder, native
from openpifpaf_tpu.plugins.coco import constants


pytestmark = pytest.mark.skipif(native.load() is None,
                                reason='native encoders not built')


class FakeAnn:
    def __init__(self, kps):
        self.data = np.asarray(kps, np.float32)
        self.iscrowd = False
        self.bbox = None


def metas():
    cif = headmeta.Cif('cif', 'test', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS)
    caf = headmeta.Caf('caf', 'test', keypoints=constants.COCO_KEYPOINTS,
                       sigmas=constants.COCO_PERSON_SIGMAS,
                       skeleton=constants.COCO_PERSON_SKELETON)
    cif.base_stride = caf.base_stride = 16
    return cif, caf


def synthetic_anns(n_people=3, seed=0):
    rng = np.random.default_rng(seed)
    anns = []
    for _ in range(n_people):
        scale = rng.uniform(30.0, 80.0)
        cx = rng.uniform(60.0, 260.0)
        cy = rng.uniform(60.0, 260.0)
        kp = np.zeros((17, 3), np.float32)
        kp[:, 0] = constants.COCO_UPRIGHT_POSE[:, 0] * scale / 3.0 + cx
        kp[:, 1] = (5.0 - constants.COCO_UPRIGHT_POSE[:, 1] / 2.0) \
            * scale / 3.0 + cy
        kp[:, 2] = 2.0
        # drop a couple of keypoints
        kp[rng.integers(0, 17, 3), 2] = 0.0
        anns.append(FakeAnn(kp))
    return anns


IMAGE = np.zeros((321, 321, 3), np.float32)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_cif_parity(seed):
    cif_meta, _ = metas()
    anns = synthetic_anns(seed=seed)
    enc_native = CifEncoder(cif_meta, use_native=True)
    enc_python = CifEncoder(cif_meta, use_native=False)
    t_nat = enc_native(IMAGE, anns)
    t_py = enc_python(IMAGE, anns)
    for key in t_py:
        got, want = np.asarray(t_nat[key]), np.asarray(t_py[key])
        if got.dtype == bool:
            mismatch = np.sum(got != want)
            assert mismatch <= want.size * 0.001, (key, mismatch)
        else:
            both = np.isclose(got, want, atol=1e-4)
            assert both.mean() > 0.999, (key, 1 - both.mean())


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_caf_parity(seed):
    _, caf_meta = metas()
    anns = synthetic_anns(seed=seed)
    t_nat = CafEncoder(caf_meta, use_native=True)(IMAGE, anns)
    t_py = CafEncoder(caf_meta, use_native=False)(IMAGE, anns)
    for key in t_py:
        got, want = np.asarray(t_nat[key]), np.asarray(t_py[key])
        if got.dtype == bool:
            mismatch = np.sum(got != want)
            assert mismatch <= max(4, want.size * 0.001), (key, mismatch)
        else:
            both = np.isclose(got, want, atol=1e-4)
            assert both.mean() > 0.999, (key, 1 - both.mean())


def test_native_is_faster():
    cif_meta, caf_meta = metas()
    anns = synthetic_anns(n_people=8, seed=3)
    import time

    n = 5
    for encoder_cls, meta in ((CifEncoder, cif_meta), (CafEncoder, caf_meta)):
        enc_nat = encoder_cls(meta, use_native=True)
        enc_py = encoder_cls(meta, use_native=False)
        enc_nat(IMAGE, anns)  # warm the library
        t0 = time.perf_counter()
        for _ in range(n):
            enc_nat(IMAGE, anns)
        t_nat = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            enc_py(IMAGE, anns)
        t_py = time.perf_counter() - t0
        # native should never be slower (usually 10-100x faster)
        assert t_nat < t_py, (encoder_cls.__name__, t_nat, t_py)
