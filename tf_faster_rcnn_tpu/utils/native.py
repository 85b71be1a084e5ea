"""ctypes loader for the native C++ CPU ops (native/nms_oracle.cpp).

Compiles the shared library on first use with g++ and caches it under
native/build/. These are host-side helpers: the golden oracle for the
on-device NMS kernels and the CPU path for eval-time re-NMS (the role the
reference's cpu_nms.pyx plays for its nms_wrapper,
/root/reference/lib/model/nms_wrapper.py:15-23).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_NATIVE_DIR = osp.abspath(osp.join(osp.dirname(__file__), "..", "..", "native"))
_SRC = osp.join(_NATIVE_DIR, "nms_oracle.cpp")
_LIB_PATH = osp.join(_NATIVE_DIR, "build", "libnms_oracle.so")

_lock = threading.Lock()
_lib = None


def _build_lib():
    os.makedirs(osp.dirname(_LIB_PATH), exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    global _lib
    with _lock:
        if _lib is None:
            if (not osp.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build_lib()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.nms_cpu.restype = ctypes.c_int
            lib.nms_cpu.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            lib.bbox_overlaps_cpu.restype = None
            lib.bbox_overlaps_cpu.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            _lib = lib
    return _lib


def nms_cpu(dets: np.ndarray, thresh: float, *, plus_one: bool = True,
            suppress_eq: bool = True) -> np.ndarray:
    """Greedy NMS. dets: [N, 5] (x1,y1,x2,y2,score). Returns kept indices.

    Defaults (plus_one=True, suppress_eq=True) match the reference cpu_nms;
    (plus_one=True, suppress_eq=False) matches its gpu_nms / CUDA kernel;
    (plus_one=False, suppress_eq=False) matches TF non_max_suppression.
    """
    dets = np.ascontiguousarray(dets, dtype=np.float32)
    n = dets.shape[0]
    if n == 0:
        return np.empty((0,), dtype=np.int64)
    keep = np.empty((n,), dtype=np.int32)
    lib = get_lib()
    num = lib.nms_cpu(
        dets.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(thresh), int(plus_one), int(suppress_eq),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:num].astype(np.int64)


def bbox_overlaps_cpu(boxes: np.ndarray, query: np.ndarray,
                      *, plus_one: bool = True) -> np.ndarray:
    """Dense IoU matrix [N, K] (native path for host-side dataset prep/eval)."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    query = np.ascontiguousarray(query, dtype=np.float32)
    n, k = boxes.shape[0], query.shape[0]
    out = np.empty((n, k), dtype=np.float32)
    if n and k:
        get_lib().bbox_overlaps_cpu(
            boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), k,
            int(plus_one), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def py_cpu_nms(dets: np.ndarray, thresh: float) -> list:
    """Vectorized numpy greedy NMS oracle (+1 areas, suppress at iou > thresh).

    Semantics of the reference's pure-python fallback
    (/root/reference/lib/nms/py_cpu_nms.py:10-38); kept as an independent
    second oracle for kernel tests.
    """
    x1, y1, x2, y2 = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3]
    scores = dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        inds = np.where(ovr <= thresh)[0]
        order = order[inds + 1]
    return keep
