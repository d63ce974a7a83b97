"""ctypes loader for the native codec (builds lazily with g++).

Replaces the reference's C host-utility layer (optimized/utils.c) with a
TPU-host-native equivalent: the lattice text codec (the host hot path when
dumping multi-GB lattices) and an independent C++ Philox4x32-10 used by the
test suite to cross-validate the JAX implementation. Loaded via ctypes —
pybind11 is deliberately not a dependency.

Importing this module raises if no compiler is available; callers (io.py)
treat that as "use the NumPy fallback".
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "codec.cpp")
_LIB = os.path.join(_DIR, "_libisingnative.so")


def _build() -> str:
    if (os.path.exists(_LIB)
            and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    # Build into a temp file then rename (atomic w.r.t. concurrent importers).
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return _LIB


_lib = ctypes.CDLL(_build())

_lib.ising_write_hex.restype = ctypes.c_int
_lib.ising_write_hex.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_int64]
_lib.ising_read_hex_dims.restype = ctypes.c_int
_lib.ising_read_hex_dims.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_int64),
                                     ctypes.POINTER(ctypes.c_int64)]
_lib.ising_read_hex_fill.restype = ctypes.c_int
_lib.ising_read_hex_fill.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int64, ctypes.c_int64]
_lib.ising_philox4x32.restype = None
_lib.ising_philox4x32.argtypes = [ctypes.POINTER(ctypes.c_uint32),
                                  ctypes.POINTER(ctypes.c_uint32),
                                  ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_uint32)]
_lib.ising_philox_plane.restype = None
_lib.ising_philox_plane.argtypes = [ctypes.c_uint64, ctypes.c_uint32,
                                    ctypes.c_uint32, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_void_p]
_lib.ising_chacha_block.restype = None
_lib.ising_chacha_block.argtypes = [ctypes.c_uint32] * 6 + [
    ctypes.c_int, ctypes.POINTER(ctypes.c_uint32)]
_lib.ising_chacha_plane.restype = None
_lib.ising_chacha_plane.argtypes = [ctypes.c_uint64, ctypes.c_uint32,
                                    ctypes.c_uint32, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_int64,
                                    ctypes.c_int, ctypes.c_void_p]


def write_hex(path: str, bits: np.ndarray) -> None:
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    rc = _lib.ising_write_hex(path.encode(), bits.ctypes.data,
                              bits.shape[0], bits.shape[1])
    if rc != 0:
        raise OSError(f"native hex write failed ({rc}) for {path}")


def read_hex(path: str) -> np.ndarray:
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = _lib.ising_read_hex_dims(path.encode(), ctypes.byref(rows),
                                  ctypes.byref(cols))
    if rc != 0:
        raise OSError(f"native hex probe failed ({rc}) for {path}")
    out = np.empty((rows.value, cols.value), np.uint8)
    rc = _lib.ising_read_hex_fill(path.encode(), out.ctypes.data,
                                  rows.value, cols.value)
    if rc != 0:
        raise OSError(f"native hex read failed ({rc}) for {path}")
    return out


def philox4x32(ctr, key, rounds: int = 10):
    c = (ctypes.c_uint32 * 4)(*[v & 0xFFFFFFFF for v in ctr])
    k = (ctypes.c_uint32 * 2)(*[v & 0xFFFFFFFF for v in key])
    o = (ctypes.c_uint32 * 4)()
    _lib.ising_philox4x32(c, k, rounds, o)
    return tuple(o)


def philox_plane(seed: int, step: int, tag: int, row0: int, nrows: int,
                 cols: int) -> np.ndarray:
    """Bulk draws with the library's quad contract (for cross-validation)."""
    out = np.empty((nrows, cols), np.uint32)
    _lib.ising_philox_plane(seed & 0xFFFFFFFFFFFFFFFF, step, tag, row0,
                            nrows, cols, out.ctypes.data)
    return out


def chacha_block(c0: int, c1: int, step: int, tag: int, key: tuple,
                 rounds: int = 8):
    """One scalar ChaCha-R block (independent C++ twin, for KATs)."""
    o = (ctypes.c_uint32 * 16)()
    _lib.ising_chacha_block(c0 & 0xFFFFFFFF, c1 & 0xFFFFFFFF,
                            step & 0xFFFFFFFF, tag & 0xFFFFFFFF,
                            key[0] & 0xFFFFFFFF, key[1] & 0xFFFFFFFF,
                            rounds, o)
    return tuple(o)


def chacha_plane(seed: int, step: int, tag: int, row0: int, nrows: int,
                 cols: int, rounds: int = 8) -> np.ndarray:
    """Bulk draws with the library's chacha 16-slot lane-group contract
    (the exact stream native/rngtest.cpp qualifies)."""
    out = np.empty((nrows, cols), np.uint32)
    _lib.ising_chacha_plane(seed & 0xFFFFFFFFFFFFFFFF, step, tag, row0,
                            nrows, cols, rounds, out.ctypes.data)
    return out
