"""ctypes binding for the native evaluation core (native/evalcore.cpp).

Auto-builds ``libevalcore.so`` with make on first use if a toolchain is
available; callers fall back to numpy when unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libevalcore.so"))

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.greedy_match.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.greedy_match.restype = None
    lib.nms_sorted.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.nms_sorted.restype = ctypes.c_int64
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def greedy_match_native(
    ious: np.ndarray,
    gt_ignore: np.ndarray,
    iscrowd: np.ndarray,
    iou_thrs: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        raise RuntimeError("evalcore not available")
    D, G = ious.shape
    T = len(iou_thrs)
    ious = np.ascontiguousarray(ious, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.int32)
    iscrowd = np.ascontiguousarray(iscrowd, np.int32)
    iou_thrs = np.ascontiguousarray(iou_thrs, np.float64)
    matched = np.zeros((T, D), np.uint8)
    ignore = np.zeros((T, D), np.uint8)
    lib.greedy_match(
        ious.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        gt_ignore.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        iscrowd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        iou_thrs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        D,
        G,
        T,
        matched.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ignore.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return matched.astype(bool), ignore.astype(bool)


def nms_native(boxes_sorted: np.ndarray, thresh: float) -> np.ndarray:
    """Keep mask over score-sorted xyxy boxes."""
    lib = _load()
    if lib is None:
        raise RuntimeError("evalcore not available")
    boxes = np.ascontiguousarray(boxes_sorted, np.float64)
    keep = np.zeros(len(boxes), np.uint8)
    lib.nms_sorted(
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(boxes),
        float(thresh),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)
