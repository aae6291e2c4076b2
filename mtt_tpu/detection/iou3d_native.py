"""ctypes bindings for the native rotated-IoU/NMS library (native/iou3d.cpp).

Host-side counterpart of the device XLA path (mtt_tpu/detection/iou3d.py);
used by evaluation/matching code on ragged CPU data. Builds the .so on
first use if the toolchain is available; callers should fall back to the
numpy/jnp implementations when `available()` is False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _root() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_root(), "libiou3d.so")
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", _root()], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.boxes_iou_bev.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, dp]
    lib.boxes_overlap_bev.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, dp]
    lib.nms_bev.restype = ctypes.c_int64
    lib.nms_bev.argtypes = [dp, dp, ctypes.c_int64, ctypes.c_double, u8]
    lib.iou_matrix_2d.argtypes = [dp, ctypes.c_int64, dp, ctypes.c_int64, dp]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def boxes_iou_bev(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    out = np.zeros((len(a), len(b)), np.float64)
    lib.boxes_iou_bev(a, len(a), b, len(b), out)
    return out


def nms_bev(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float64)
    scores = np.ascontiguousarray(scores, np.float64)
    keep = np.zeros((len(boxes),), np.uint8)
    lib.nms_bev(boxes, scores, len(boxes), float(iou_thr), keep)
    return keep.astype(bool)


def iou_matrix_2d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lib = _load()
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    out = np.zeros((len(a), len(b)), np.float64)
    lib.iou_matrix_2d(a, len(a), b, len(b), out)
    return out
