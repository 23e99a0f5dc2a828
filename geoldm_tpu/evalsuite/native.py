"""ctypes binding for the native C++ stability analyzer.

Builds native/stability.cpp with g++ on first use (cached in
native/build/), binds it via ctypes, and exposes a batch API. When the
toolchain or the build is unavailable, callers fall back to the numpy
implementation in evalsuite/analyze.py — which is also the correctness
reference for the parity test.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "stability.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO_PATH = os.path.join(_BUILD_DIR, "libstability.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if not os.path.exists(_SRC):
        _build_failed = True
        return None
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO_PATH]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_SO_PATH)
    fn = lib.check_stability_batch
    fn.restype = None
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # positions
        ctypes.POINTER(ctypes.c_int32),   # atom_types
        ctypes.POINTER(ctypes.c_int32),   # n_atoms
        ctypes.c_int64,                   # n_mols
        ctypes.c_int64,                   # max_n
        ctypes.POINTER(ctypes.c_double),  # thr1
        ctypes.POINTER(ctypes.c_double),  # thr2
        ctypes.POINTER(ctypes.c_double),  # thr3
        ctypes.c_int64,                   # s
        ctypes.POINTER(ctypes.c_int32),   # allowed
        ctypes.c_int64,                   # max_allowed
        ctypes.POINTER(ctypes.c_int32),   # out_stable_atoms
        ctypes.POINTER(ctypes.c_int32),   # out_total_atoms
        ctypes.POINTER(ctypes.c_int32),   # out_mol_stable
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is None and not _build_failed:
            _lib = _build()
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def check_stability_batch(
    positions: np.ndarray,
    atom_types: np.ndarray,
    n_atoms: np.ndarray,
    dataset_info,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batched stability check. positions [M, N, 3] (Angstrom, padded),
    atom_types [M, N] int, n_atoms [M] int ->
    (stable_atoms [M], total_atoms [M], mol_stable [M] bool)."""
    from geoldm_tpu.evalsuite import bond_analyze as ba

    lib = get_lib()
    assert lib is not None, "native stability library unavailable"

    decoder = tuple(dataset_info["atom_decoder"])
    thr1, thr2, thr3 = ba.threshold_matrices(decoder)
    allowed = ba.allowed_bond_table(decoder)
    max_allowed = max(len(a) for a in allowed)
    allowed_arr = np.full((len(decoder), max_allowed), -1, dtype=np.int32)
    for i, vals in enumerate(allowed):
        allowed_arr[i, : len(vals)] = vals

    positions = np.ascontiguousarray(positions, dtype=np.float32)
    atom_types = np.ascontiguousarray(atom_types, dtype=np.int32)
    n_atoms = np.ascontiguousarray(n_atoms, dtype=np.int32)
    thr1 = np.ascontiguousarray(thr1)
    thr2 = np.ascontiguousarray(thr2)
    thr3 = np.ascontiguousarray(thr3)

    m = positions.shape[0]
    out_stable = np.zeros(m, dtype=np.int32)
    out_total = np.zeros(m, dtype=np.int32)
    out_mol = np.zeros(m, dtype=np.int32)

    lib.check_stability_batch(
        _as_ptr(positions, ctypes.c_float),
        _as_ptr(atom_types, ctypes.c_int32),
        _as_ptr(n_atoms, ctypes.c_int32),
        ctypes.c_int64(m),
        ctypes.c_int64(positions.shape[1]),
        _as_ptr(thr1, ctypes.c_double),
        _as_ptr(thr2, ctypes.c_double),
        _as_ptr(thr3, ctypes.c_double),
        ctypes.c_int64(len(decoder)),
        _as_ptr(allowed_arr, ctypes.c_int32),
        ctypes.c_int64(max_allowed),
        _as_ptr(out_stable, ctypes.c_int32),
        _as_ptr(out_total, ctypes.c_int32),
        _as_ptr(out_mol, ctypes.c_int32),
    )
    return out_stable, out_total, out_mol.astype(bool)
