"""ctypes binding for the native table parser (native/fasttable.c).

The shared library is compiled on first use with the system compiler and
cached next to the source; loadtxt_fast falls back to numpy if the native
build is unavailable (reference counterpart: the C++ stream parsers of
grid.cc:1836+ and input.cc:912-1255).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    src = os.path.join(here, "native", "fasttable.c")
    so = os.path.join(here, "native", "libfasttable.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O2", "-shared", "-fPIC", "-o", so, src],
                        check=True, capture_output=True, timeout=120,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
        lib = ctypes.CDLL(so)
        lib.fasttable_parse.restype = ctypes.c_long
        lib.fasttable_parse.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long
        ]
        lib.fasttable_count.restype = ctypes.c_long
        lib.fasttable_count.argtypes = [ctypes.c_char_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def loadtxt_fast(path: str, ncols: int | None = None) -> np.ndarray:
    """Parse a numeric whitespace table ('#' comments skipped, non-numeric
    tokens ignored). Returns a flat float64 array, or (nrows, ncols) when
    ncols is given."""
    lib = _build_and_load()
    if lib is not None:
        # single pass: a numeric token needs >= 2 bytes incl. separator
        capacity = os.path.getsize(path) // 2 + 16
        out = np.empty(capacity, np.float64)
        got = lib.fasttable_parse(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            capacity,
        )
        if got >= 0:
            out = out[:got]
            return out.reshape(-1, ncols) if ncols else out
    # numpy fallback
    data = np.loadtxt(path, comments="#", ndmin=2)
    flat = data.reshape(-1)
    return flat.reshape(-1, ncols) if ncols else flat
