"""Native (C++) fast paths, loaded via ctypes with graceful fallback.

``get_batchpack()`` returns the compiled batch-assembler entry point or None.
The library auto-builds once per machine into the package directory; any
failure (no compiler, readonly fs) silently falls back to the NumPy path in
data/loader.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batchpack.cc")
_LIB = os.path.join(_HERE, "libbatchpack.so")
_lock = threading.Lock()
_cached: Optional[object] = None
_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_batchpack():
    """ctypes handle to pack_batch, or None when unavailable."""
    global _cached, _failed
    if _cached is not None or _failed:
        return _cached
    with _lock:
        if _cached is not None or _failed:
            return _cached
        if not os.path.isfile(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        fn = lib.pack_batch
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        fn.argtypes = [i32p, i64p, i64p, f32p, i64p, i64p,
                       ctypes.c_int64, i64p, i64p, ctypes.c_int64,
                       i32p, ctypes.c_int64, f32p, ctypes.c_int64,
                       i32p, i32p]
        fn.restype = None
        _cached = fn
        return _cached
