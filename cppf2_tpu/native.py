"""Native library loader: builds/loads libcppf2_native.so via ctypes.

The runtime's host-side native core (native/iou3d.cpp — exact box IoU for the
mAP hot loop; native/records.cpp — mmap'd record store for the data pipeline).
Everything has a pure-Python fallback; the native path is an acceleration, not
a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_LIB = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_ROOT, "native")
_SO = os.path.join(_NATIVE_DIR, "libcppf2_native.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building on first use) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        src_newer = True
    else:
        src_newer = any(
            os.path.getmtime(os.path.join(_NATIVE_DIR, f)) > os.path.getmtime(_SO)
            for f in ("iou3d.cpp", "records.cpp")
            if os.path.exists(os.path.join(_NATIVE_DIR, f))
        )
    if src_newer and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.box_iou.restype = ctypes.c_double
    lib.box_iou.argtypes = [ctypes.c_void_p] * 6
    lib.batch_iou_sym.restype = None
    lib.batch_iou_sym.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p,
    ]
    lib.rec_open.restype = ctypes.c_void_p
    lib.rec_open.argtypes = [ctypes.c_char_p]
    lib.rec_close.argtypes = [ctypes.c_void_p]
    lib.rec_count.restype = ctypes.c_uint64
    lib.rec_count.argtypes = [ctypes.c_void_p]
    lib.rec_field_count.restype = ctypes.c_uint64
    lib.rec_field_count.argtypes = [ctypes.c_void_p]
    lib.rec_field_name.restype = ctypes.c_char_p
    lib.rec_field_name.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.rec_field_dtype.restype = ctypes.c_uint32
    lib.rec_field_dtype.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.rec_field_ndim.restype = ctypes.c_uint32
    lib.rec_field_ndim.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.rec_field_shape.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
    lib.rec_gather.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB
