"""ctypes bindings for the native IO library (native/colmap_io.cpp).

Loads ``libgsio.so`` from native/build if present; every entry point has a
pure-Python fallback in data/colmap.py, so the library is an optional
accelerator, not a dependency.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_SEARCHED = False


def _find_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _SEARCHED
    if _SEARCHED:
        return _LIB
    _SEARCHED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(root, "native", "build", "libgsio.so"),
        os.path.join(root, "native", "libgsio.so"),
        os.environ.get("GSIO_LIB", ""),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            lib = ctypes.CDLL(c)
            lib.gsio_read_points3d_bin.restype = ctypes.POINTER(ctypes.c_double)
            lib.gsio_read_points3d_bin.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gsio_read_images_bin.restype = ctypes.POINTER(ctypes.c_double)
            lib.gsio_read_images_bin.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gsio_read_cameras_bin.restype = ctypes.POINTER(ctypes.c_double)
            lib.gsio_read_cameras_bin.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gsio_free.argtypes = [ctypes.c_void_p]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _find_lib() is not None


def read_points3d_bin(path: str):
    """-> (xyz (N,3), rgb (N,3), err (N,1)) or None if unavailable/failed."""
    lib = _find_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    ptr = lib.gsio_read_points3d_bin(path.encode(), ctypes.byref(n))
    if not ptr or n.value < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(n.value, 7)).copy()
    finally:
        lib.gsio_free(ptr)
    return arr[:, 0:3], arr[:, 3:6], arr[:, 6:7]


def read_images_bin(path: str):
    """-> list of dicts {id, qvec, tvec, camera_id, name} or None."""
    lib = _find_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    names_p = ctypes.c_char_p()
    names_len = ctypes.c_int64()
    ptr = lib.gsio_read_images_bin(
        path.encode(), ctypes.byref(n), ctypes.byref(names_p), ctypes.byref(names_len)
    )
    if not ptr or n.value < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(n.value, 9)).copy()
        names = ctypes.string_at(names_p, names_len.value).decode().split("\n")[:-1]
    finally:
        lib.gsio_free(ptr)
        lib.gsio_free(names_p)
    out = []
    for i in range(n.value):
        out.append(
            {
                "id": int(arr[i, 0]),
                "qvec": arr[i, 1:5].copy(),
                "tvec": arr[i, 5:8].copy(),
                "camera_id": int(arr[i, 8]),
                "name": names[i],
            }
        )
    return out


def read_cameras_bin(path: str):
    """-> list of dicts {id, model_id, width, height, params} or None."""
    lib = _find_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    ptr = lib.gsio_read_cameras_bin(path.encode(), ctypes.byref(n))
    if not ptr or n.value < 0:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(n.value, 16)).copy()
    finally:
        lib.gsio_free(ptr)
    out = []
    for i in range(n.value):
        out.append(
            {
                "id": int(arr[i, 0]),
                "model_id": int(arr[i, 1]),
                "width": int(arr[i, 2]),
                "height": int(arr[i, 3]),
                "params": arr[i, 4:16].copy(),
            }
        )
    return out
