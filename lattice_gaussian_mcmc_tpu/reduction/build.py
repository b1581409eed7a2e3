"""Lazy build of the native reduction library (g++ -O3 -shared)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "lattice_reduce.cpp")
_SO = os.path.join(_HERE, "cpp", "liblattice_reduce.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once, if needed) and dlopen the reduction library.
    Returns None if no compiler is available — callers fall back to the
    pure-Python LLL."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO) or
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.lll_reduce.argtypes = [ctypes.POINTER(ctypes.c_int64),
                                       ctypes.c_int, ctypes.c_double]
            lib.lll_reduce.restype = ctypes.c_int
            lib.bkz_reduce.argtypes = [ctypes.POINTER(ctypes.c_int64),
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_double, ctypes.c_int]
            lib.bkz_reduce.restype = ctypes.c_int
            lib.gso_profile.argtypes = [ctypes.POINTER(ctypes.c_int64),
                                        ctypes.c_int,
                                        ctypes.POINTER(ctypes.c_double)]
            lib.gso_profile.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _lib = None
        return _lib
