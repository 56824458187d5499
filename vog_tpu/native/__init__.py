"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these are host-side runtime pieces
(feature-store IO) where C++ threads beat GIL-bound Python.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).parent / "featpack.cpp"
_SO = Path(__file__).parent / "libfeatpack.so"
_lib: Optional[ctypes.CDLL] = None


def build_featpack(force: bool = False) -> Path:
    """Compile the featpack shared library (cached by mtime)."""
    if force or not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                "-o", str(_SO), str(_SRC), "-lpthread",
            ],
            check=True,
        )
    return _SO


def load_featpack() -> ctypes.CDLL:
    """Build (if needed) and load libfeatpack with typed signatures."""
    global _lib
    if _lib is not None:
        return _lib
    build_featpack()
    lib = ctypes.CDLL(str(_SO))
    lib.fp_open.restype = ctypes.c_void_p
    lib.fp_open.argtypes = [ctypes.c_char_p]
    lib.fp_close.argtypes = [ctypes.c_void_p]
    lib.fp_size.restype = ctypes.c_uint64
    lib.fp_size.argtypes = [ctypes.c_void_p]
    lib.fp_gather.restype = ctypes.c_int
    lib.fp_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    _lib = lib
    return lib
