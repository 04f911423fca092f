"""Native (C++) host-side kernels, ctypes-bound, with numpy fallbacks.

The reference's native tier is build-time-optional NMS (reference
vit_utils/nms/, SURVEY §2.2); same stance here: everything works without the
build, the extension just makes host-side NMS C-fast.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libnms.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nms_cpu.restype = ctypes.c_int
        lib.nms_cpu.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def nms_cpu(dets: np.ndarray, thr: float) -> List[int]:
    """Greedy IoU NMS over [x1,y1,x2,y2,score] rows.  Uses the C++ kernel
    when built, otherwise the numpy implementation (ops/oks.py)."""
    dets = np.ascontiguousarray(dets, np.float32)
    lib = _load()
    if lib is None:
        from ..ops.oks import bbox_nms
        return bbox_nms(dets, thr)
    n = len(dets)
    keep = np.zeros(n, np.int32)
    kept = lib.nms_cpu(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(thr), keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:kept].tolist()
