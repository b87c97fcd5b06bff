"""ctypes bindings for the native PLY codec (native/plyio.cpp).

The fast path for scene IO: a single-pass C++ AoS->SoA de-interleave
(the role SplatData.cpp:114-156's bulk fread plays in the reference). Falls
back transparently to the numpy reader (scene/ply.py) when the shared library
is not built or the file is ascii/big-endian.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libgsply.so"))


def _load_lib(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(
                ["make", "-s"], cwd=os.path.abspath(_NATIVE_DIR),
                check=True, capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.gsply_header.restype = ctypes.c_long
    lib.gsply_header.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long]
    lib.gsply_read_f32.restype = ctypes.c_int
    lib.gsply_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int,
    ]
    lib.gsply_write_f32.restype = ctypes.c_int
    lib.gsply_write_f32.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int, ctypes.c_long,
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load_lib() is not None


def read_ply_columns(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Native read: {property: float32 (N,)}. None if unavailable/unsupported
    (caller falls back to the numpy reader)."""
    lib = _load_lib()
    if lib is None:
        return None
    names_buf = ctypes.create_string_buffer(1 << 16)
    count = lib.gsply_header(path.encode(), names_buf, len(names_buf))
    if count < 0:
        return None
    names = names_buf.value.decode().strip().split("\n")
    cols = [np.empty(count, np.float32) for _ in names]
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(cols))(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for c in cols]
    )
    rc = lib.gsply_read_f32(path.encode(), ptrs, len(cols))
    if rc != 0:
        return None
    return dict(zip(names, cols))


def write_ply_columns(path: str, columns: Dict[str, np.ndarray]) -> bool:
    lib = _load_lib()
    if lib is None:
        return False
    names = list(columns)
    cols = [np.ascontiguousarray(columns[n], np.float32) for n in names]
    n = len(cols[0]) if cols else 0
    ptrs = (ctypes.POINTER(ctypes.c_float) * len(cols))(
        *[c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for c in cols]
    )
    rc = lib.gsply_write_f32(
        path.encode(), "\n".join(names).encode(), ptrs, len(cols), n
    )
    return rc == 0
