"""Native (C++) fast paths, loaded via ctypes with graceful fallback.

``get_batchpack()`` returns the compiled batch-assembler entry point or None.
The library auto-builds once per (machine, source) into the package
directory; ANY failure (no compiler, readonly fs, corrupt/foreign binary)
silently falls back to the NumPy path in data/loader.py.

Build hygiene (multi-host / shared-checkout safe):
  * the compiler writes to a per-process temp name and the result is
    os.replace()'d in — concurrent builders cannot expose a truncated ELF;
  * the cache is keyed by a sidecar fingerprint (source mtime + machine +
    CPU model), not bare mtime: ``-march=native`` binaries from a different
    host on a shared filesystem would SIGILL, so they are rebuilt instead
    of trusted.
"""

from __future__ import annotations

import ctypes
import os
import platform
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "batchpack.cc")
_LIB = os.path.join(_HERE, "libbatchpack.so")
_INFO = _LIB + ".buildinfo"
_lock = threading.Lock()
_cached: Optional[object] = None
_failed = False


def _cpu_model() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or "unknown"


def _fingerprint() -> str:
    return f"{os.path.getmtime(_SRC)}|{platform.machine()}|{_cpu_model()}"


def _build() -> bool:
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", tmp, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)  # atomic: readers never see a partial ELF
        with open(_INFO + ".tmp", "w") as f:
            f.write(_fingerprint())
        os.replace(_INFO + ".tmp", _INFO)
        return True
    except Exception:
        for p in (tmp, _INFO + ".tmp"):
            try:
                os.remove(p)
            except OSError:
                pass
        return False


def _current() -> bool:
    try:
        with open(_INFO) as f:
            return f.read() == _fingerprint() and os.path.isfile(_LIB)
    except OSError:
        return False


def get_batchpack():
    """ctypes handle to pack_batch, or None when unavailable. Never raises:
    the loader's NumPy path is always a safe fallback."""
    global _cached, _failed
    if _cached is not None or _failed:
        return _cached
    with _lock:
        if _cached is not None or _failed:
            return _cached
        try:
            if not _current() and not _build():
                _failed = True
                return None
            lib = ctypes.CDLL(_LIB)
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
        except Exception:
            _failed = True
            return None
        return _cached
