"""ctypes binding for the native packet-file writer (native/packetio.c).

Same build-on-first-use pattern as io/fasttable.py; falls back to the Python
row formatter when no compiler is available (reference counterpart:
packet.cc:165-190 write_packets).
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
    src = os.path.join(here, "native", "packetio.c")
    so = os.path.join(here, "native", "libpacketio.so")
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
        lib.packetio_write_text.restype = ctypes.c_long
        lib.packetio_write_text.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
            ctypes.c_char_p,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def write_text_table(path: str, header: str, cols, kinds: str) -> bool:
    """Write a whitespace table from float64 column arrays; kinds is one char
    per column: 'i' integer, 'f' float (%g). Returns False if the native
    library is unavailable (caller should fall back)."""
    lib = _build_and_load()
    if lib is None:
        return False
    mat = np.ascontiguousarray(np.stack(
        [np.asarray(c, dtype=np.float64) for c in cols], axis=1
    ))
    nrows, ncols = mat.shape
    assert len(kinds) == ncols
    got = lib.packetio_write_text(
        path.encode(), header.encode(),
        mat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        nrows, ncols, kinds.encode(),
    )
    return got == nrows
