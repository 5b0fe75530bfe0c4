"""ctypes bindings for the C++ host lattice builder.

The library is built on demand with the repo toolchain (g++ via make) and
cached next to the source; all entry points degrade gracefully when no
compiler is available (``native_available()`` -> False).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

__all__ = ["load_library", "native_available", "HostLatticeBuilder"]

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "liblattice_builder.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False

# packing for the host path: 21 bits per coordinate in an int64 (the device
# path uses int32 pairs; the host has native int64)
COORD_BITS = 21
COORD_BIAS = 1 << (COORD_BITS - 1)
SENTINEL = np.int64(np.iinfo(np.int64).max)


def _build_library() -> bool:
    try:
        subprocess.run(["make", "-s", "-C", _DIR], check=True,
                       capture_output=True, timeout=120)
        return osp.exists(_LIB_PATH)
    except Exception:
        return False


def load_library():
    """Load (building if needed) the shared library; None on failure."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not osp.exists(_LIB_PATH) and not _build_library():
            return None
        lib = ctypes.CDLL(_LIB_PATH)

        lib.hpl_build_cloud.restype = ctypes.c_longlong
        lib.hpl_build_cloud.argtypes = [
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.hpl_neighbor_table.restype = None
        lib.hpl_neighbor_table.argtypes = [
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.hpl_corr_tables.restype = None
        lib.hpl_corr_tables.argtypes = [
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.c_longlong, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_library() is not None


def _ll_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def _i_ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def pack_keys_i64(keys: np.ndarray, d: int) -> np.ndarray:
    """(..., d1) int keys -> int64 packed (drops the redundant last coord)."""
    keys = keys.astype(np.int64)
    out = np.zeros(keys.shape[:-1], dtype=np.int64)
    for j in range(d):
        out = (out << COORD_BITS) | (keys[..., j] + COORD_BIAS)
    return out


def pack_deltas_i64(offsets: np.ndarray, d: int) -> np.ndarray:
    offsets = offsets.astype(np.int64)
    out = np.zeros(offsets.shape[:-1], dtype=np.int64)
    for j in range(d):
        out = (out << COORD_BITS) + offsets[..., j]
    return out


class HostLatticeBuilder:
    """Numpy-facing wrapper over the C++ builder."""

    def __init__(self, d: int = 3):
        self.d = d
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError("native lattice builder unavailable "
                               "(no g++/make?)")

    def build_cloud(self, keys: np.ndarray, capacity: int):
        """keys (N, d1, d1) int -> (unique (cap,), ids (N, d1), num_unique)."""
        packed = np.ascontiguousarray(
            pack_keys_i64(keys, self.d).reshape(-1))
        n = packed.size
        unique = np.empty(capacity, dtype=np.int64)
        ids = np.empty(n, dtype=np.int32)
        scratch = np.empty(n, dtype=np.int64)
        total = self.lib.hpl_build_cloud(
            _ll_ptr(packed), n, SENTINEL, capacity,
            _ll_ptr(unique), _i_ptr(ids), _ll_ptr(scratch))
        return unique, ids.reshape(keys.shape[:-1]), int(total)

    def neighbor_table(self, unique: np.ndarray, num_valid: int,
                       offsets: np.ndarray) -> np.ndarray:
        deltas = np.ascontiguousarray(pack_deltas_i64(offsets, self.d))
        cap, f = unique.size, deltas.size
        out = np.empty((f, cap), dtype=np.int32)   # stencil-major
        self.lib.hpl_neighbor_table(
            _ll_ptr(unique), cap, num_valid, SENTINEL,
            _ll_ptr(deltas), f, _i_ptr(out))
        return out

    def corr_tables(self, unique1, n1, unique2, n2, filter_offsets,
                    corr_offsets):
        fd = np.ascontiguousarray(pack_deltas_i64(filter_offsets, self.d))
        cd = np.ascontiguousarray(pack_deltas_i64(corr_offsets, self.d))
        cap1 = unique1.size
        pc1 = np.empty((cd.size, cap1), dtype=np.int32)   # stencil-major
        pc2 = np.empty((fd.size, cd.size, cap1), dtype=np.int32)
        self.lib.hpl_corr_tables(
            _ll_ptr(unique1), cap1, n1,
            _ll_ptr(unique2), unique2.size, n2, SENTINEL,
            _ll_ptr(cd), cd.size, _ll_ptr(fd), fd.size,
            _i_ptr(pc1), _i_ptr(pc2))
        return pc1, pc2
