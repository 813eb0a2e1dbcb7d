"""ctypes bindings for the native connected-component labeler (native/cc_label.cpp).

Compiled on demand with g++ into a cached shared library; falls back to
scipy.ndimage when no compiler is available. Used for large host-side masks;
on-device patch grids use ops/morphology.label_components instead.
"""
from __future__ import annotations

import ctypes
import hashlib
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "cc_label.cpp"
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        src = _SRC.read_text()
        tag = hashlib.sha256(src.encode()).hexdigest()[:16]
        cache = Path(tempfile.gettempdir()) / f"dss_tpu_cclabel_{tag}.so"
        if not cache.is_file():
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(cache)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(cache))
        lib.cc_label.restype = ctypes.c_int32
        lib.cc_label.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        lib.largest_component.restype = ctypes.c_int64
        lib.largest_component.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8)]
        lib.label_bboxes.restype = None
        lib.label_bboxes.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except Exception:
        _lib_failed = True
    return _lib


def _as_u8(mask: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(mask.astype(np.uint8))


def cc_label(mask: np.ndarray, connectivity: int = 2) -> tuple[np.ndarray, int]:
    """(labels int32 (h, w) with 0 background, num_components)."""
    lib = _build_lib()
    h, w = mask.shape
    if lib is None:
        import scipy.ndimage as ndi
        structure = np.ones((3, 3)) if connectivity == 2 else None
        labels, num = ndi.label(mask, structure=structure)
        return labels.astype(np.int32), int(num)
    m = _as_u8(mask)
    labels = np.empty((h, w), np.int32)
    num = lib.cc_label(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       h, w, connectivity,
                       labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels, int(num)


def largest_component(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    lib = _build_lib()
    h, w = mask.shape
    if lib is None:
        labels, num = cc_label(mask, connectivity)
        if num == 0:
            return np.zeros_like(mask, bool)
        sizes = np.bincount(labels.ravel())[1:]
        return labels == (int(np.argmax(sizes)) + 1)
    m = _as_u8(mask)
    out = np.empty((h, w), np.uint8)
    lib.largest_component(m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                          h, w, connectivity,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)


def label_bboxes(labels: np.ndarray, num_labels: int) -> np.ndarray:
    """(num_labels, 4) int32 [xmin, ymin, xmax, ymax] (exclusive max) per label."""
    lib = _build_lib()
    h, w = labels.shape
    if lib is None:
        boxes = np.zeros((num_labels, 4), np.int32)
        for c in range(1, num_labels + 1):
            ys, xs = np.where(labels == c)
            if len(ys):
                boxes[c - 1] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        return boxes
    lab = np.ascontiguousarray(labels.astype(np.int32))
    boxes = np.empty((num_labels, 4), np.int32)
    lib.label_bboxes(lab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                     h, w, num_labels,
                     boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return boxes
