"""ctypes binding for the native (C++) target encoders.

The reference builds its native component as a torch extension
(``setup.py:~40``); here the host-side painting loops live in
``csrc/encoders.cpp``, compiled to a plain shared library (no Python
dependency) and bound with ctypes.  The library is built on first use if a
compiler is available; the numpy encoders remain the fallback and the
correctness oracle (tests compare the two paths).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

LOG = logging.getLogger(__name__)

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'csrc')
_LIB_PATH = os.path.join(_CSRC_DIR, 'libencoders.so')

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(['make', '-C', _CSRC_DIR], check=True,
                       capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        LOG.info('native encoder build unavailable: %s', e)
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried  # pylint: disable=global-statement
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:  # pragma: no cover - stale/foreign binary
        LOG.warning('could not load %s: %s', _LIB_PATH, e)
        return None

    f32 = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.paint_cif.argtypes = [
        f32, f32, f32,                      # kps, inst_scale, sigmas
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long, ctypes.c_float,      # side_length, v_threshold
        f32, u8, f32, u8, f32, u8, f32,
    ]
    lib.paint_caf.argtypes = [
        f32, f32, f32, i32,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_long,
        ctypes.c_float, ctypes.c_float,     # min_size, v_threshold
        f32, u8, f32, u8, f32, u8, f32,
    ]
    _lib = lib
    LOG.debug('native encoders loaded from %s', _LIB_PATH)
    return _lib


def _ptr(array: np.ndarray, ctype):
    return array.ctypes.data_as(ctypes.POINTER(ctype))


def paint_cif(kp_sets, inst_scales, sigmas, *, h, w, side_length,
              v_threshold, conf, conf_mask, vec, vec_mask, scale,
              scale_mask) -> bool:
    """Native CIF painting; returns False when the library is unavailable."""
    lib = load()
    if lib is None or not kp_sets:
        return lib is not None and not kp_sets
    kps = np.ascontiguousarray(np.stack(kp_sets), np.float32)
    inst = np.ascontiguousarray(inst_scales, np.float32)
    sig = np.ascontiguousarray(sigmas, np.float32)
    k = kps.shape[1]
    closest = np.full((k, h, w), np.inf, np.float32)
    conf_mask_u8 = conf_mask.view(np.uint8)
    vec_mask_u8 = vec_mask.view(np.uint8)
    scale_mask_u8 = scale_mask.view(np.uint8)
    lib.paint_cif(
        _ptr(kps, ctypes.c_float), _ptr(inst, ctypes.c_float),
        _ptr(sig, ctypes.c_float),
        kps.shape[0], k, h, w, side_length, v_threshold,
        _ptr(conf, ctypes.c_float), _ptr(conf_mask_u8, ctypes.c_uint8),
        _ptr(vec, ctypes.c_float), _ptr(vec_mask_u8, ctypes.c_uint8),
        _ptr(scale, ctypes.c_float), _ptr(scale_mask_u8, ctypes.c_uint8),
        _ptr(closest, ctypes.c_float))
    return True


def paint_caf(kp_sets, inst_scales, sigmas, skeleton, *, h, w, min_size,
              v_threshold, conf, conf_mask, vec, vec_mask, scale,
              scale_mask) -> bool:
    """Native CAF painting; returns False when the library is unavailable."""
    lib = load()
    if lib is None or not kp_sets:
        return lib is not None and not kp_sets
    kps = np.ascontiguousarray(np.stack(kp_sets), np.float32)
    inst = np.ascontiguousarray(inst_scales, np.float32)
    sig = np.ascontiguousarray(sigmas, np.float32)
    skel = np.ascontiguousarray(skeleton, np.int32)
    e = skel.shape[0]
    closest = np.full((e, h, w), np.inf, np.float32)
    lib.paint_caf(
        _ptr(kps, ctypes.c_float), _ptr(inst, ctypes.c_float),
        _ptr(sig, ctypes.c_float), _ptr(skel, ctypes.c_int32),
        kps.shape[0], kps.shape[1], e, h, w,
        float(min_size), v_threshold,
        _ptr(conf, ctypes.c_float),
        _ptr(conf_mask.view(np.uint8), ctypes.c_uint8),
        _ptr(vec, ctypes.c_float),
        _ptr(vec_mask.view(np.uint8), ctypes.c_uint8),
        _ptr(scale, ctypes.c_float),
        _ptr(scale_mask.view(np.uint8), ctypes.c_uint8),
        _ptr(closest, ctypes.c_float))
    return True
