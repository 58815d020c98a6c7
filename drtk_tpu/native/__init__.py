"""Native host-side helpers (C++ via ctypes).

The reference keeps its host-side heavy lifting in C++ (the CSR structure
build of `interpolate_module.cpp:124-219` runs on CPU inside the torch
extension). This package provides the same natively: `src/drtk_native.cpp`
is compiled on first import with ``g++ -O3`` into a cached shared library
and bound through ctypes (no Python.h dependency). If no compiler is
available the importer raises ImportError and callers fall back to the
numpy implementation (drtk_tpu/ops/interpolate.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

__all__ = ["build_pair_structure"]

_SRC = os.path.join(os.path.dirname(__file__), "src", "drtk_native.cpp")


def _build_library() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "DRTK_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "drtk_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, f"drtk_native_{digest}.so")
    if not os.path.exists(lib_path):
        tmp_path = lib_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
             "-o", tmp_path],
            check=True,
            capture_output=True,
        )
        os.replace(tmp_path, lib_path)  # atomic for concurrent importers
    return lib_path


try:
    _lib = ctypes.CDLL(_build_library())
except (OSError, subprocess.CalledProcessError, FileNotFoundError) as e:
    raise ImportError(f"drtk_tpu.native: cannot build native library: {e}")

_lib.drtk_build_pair_structure.restype = ctypes.c_int
_lib.drtk_build_pair_structure.argtypes = [
    ctypes.POINTER(ctypes.c_int32),
    ctypes.c_int64,
    ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int32),
    ctypes.POINTER(ctypes.c_int64),
]


def build_pair_structure(vi: np.ndarray, num_vertices: int):
    """Deduplicated vertex-pair structure of A^T A for topology ``vi``.

    Args:
        vi: [F, 3] int32 face indices.
        num_vertices: vertex count V.

    Returns:
        (rows [nnz] int32, cols [nnz] int32, pair_slot [F, 9] int32) — the
        COO structure plus the per-face pair->slot lookup, identical to the
        numpy fallback in drtk_tpu/ops/interpolate.py.
    """
    vi = np.ascontiguousarray(vi, dtype=np.int32)
    if vi.ndim != 2 or vi.shape[1] != 3:
        raise ValueError(f"build_pair_structure: expected [F, 3] vi, got {vi.shape}")
    f_cnt = vi.shape[0]
    rows = np.empty(f_cnt * 9, np.int32)
    cols = np.empty(f_cnt * 9, np.int32)
    pair_slot = np.empty((f_cnt, 9), np.int32)
    nnz = ctypes.c_int64(0)

    def ptr(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    status = _lib.drtk_build_pair_structure(
        ptr(vi), ctypes.c_int64(f_cnt), ctypes.c_int64(int(num_vertices)),
        ptr(rows), ptr(cols), ptr(pair_slot), ctypes.byref(nnz),
    )
    if status != 0:
        raise ValueError(
            f"build_pair_structure: native builder failed (status {status}; "
            "out-of-range vertex index?)"
        )
    n = int(nnz.value)
    return rows[:n].copy(), cols[:n].copy(), pair_slot
