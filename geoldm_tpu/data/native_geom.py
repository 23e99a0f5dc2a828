"""ctypes binding for the native C++ GEOM conformer extractor.

Builds native/geom_extract.cpp with g++ on first use (cached in
native/build/), binds it via ctypes, and exposes
:func:`extract_conformers_native`. The streaming C++ parser never holds
the (multi-gigabyte) crude msgpack dump in memory. The Python
implementation (geoldm_tpu/data/geom.py extract_conformers) remains the
correctness reference and the fallback; tests/test_native_geom.py drives
both on synthetic msgpack data and asserts identical outputs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "geom_extract.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO_PATH = os.path.join(_BUILD_DIR, "libgeom_extract.so")

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
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
               _SRC, "-o", _SO_PATH]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    lib = ctypes.CDLL(_SO_PATH)
    fn = lib.geom_extract_conformers
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p,                    # msgpack_path
        ctypes.c_char_p,                    # out_npy_path
        ctypes.c_char_p,                    # out_counts_path
        ctypes.c_char_p,                    # out_smiles_path
        ctypes.c_int64,                     # conformations
        ctypes.c_int32,                     # remove_h
        ctypes.POINTER(ctypes.c_int64),     # out_rows
        ctypes.POINTER(ctypes.c_int64),     # out_mols
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


def extract_conformers_native(
    data_dir: str,
    data_file: str = "drugs_crude.msgpack",
    conformations: int = 30,
    remove_h: bool = False,
) -> str:
    """Native counterpart of geom.extract_conformers — same outputs
    (geom_drugs_[no_h_]{K}.npy, geom_drugs_n_{tag}.npy,
    geom_drugs_smiles.txt); returns the .npy path."""
    lib = get_lib()
    assert lib is not None, "native geom extractor unavailable"
    tag = f"{'no_h_' if remove_h else ''}{conformations}"
    save_file = os.path.join(data_dir, f"geom_drugs_{tag}.npy")
    counts_file = os.path.join(data_dir, f"geom_drugs_n_{tag}.npy")
    smiles_file = os.path.join(data_dir, "geom_drugs_smiles.txt")
    rows = ctypes.c_int64(0)
    mols = ctypes.c_int64(0)
    rc = lib.geom_extract_conformers(
        os.path.join(data_dir, data_file).encode(),
        save_file.encode(),
        counts_file.encode(),
        smiles_file.encode(),
        ctypes.c_int64(conformations),
        ctypes.c_int32(1 if remove_h else 0),
        ctypes.byref(rows),
        ctypes.byref(mols),
    )
    if rc != 0:
        raise RuntimeError(
            f"native geom extraction failed (code {rc}) on "
            f"{os.path.join(data_dir, data_file)}"
        )
    print(f"native extractor: {mols.value} conformers, {rows.value} atom rows")
    return save_file
