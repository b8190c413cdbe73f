"""ctypes loader for the native chem-lite kernels (csrc/chemlite.cpp).

Builds the shared library on first use (g++ -O3; cached in csrc/build/)
and degrades silently to the pure-Python implementations when no compiler
is available. The exploration ingestion loop calls these thousands of
times per CRN level, so the native path matters for host-side throughput.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..utils.logging import logger

_CSRC = os.path.normpath(os.path.join(os.path.dirname(__file__), "..", "..",
                                      "csrc"))
_LIB_PATH = os.path.join(_CSRC, "build", "libchemlite.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "chemlite.cpp")
    if not os.path.isfile(src):
        return False
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, src],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception as exc:
        logger.debug("chemlite native build failed: %s", exc)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.chemlite_perceive_bonds.restype = ctypes.c_int
        lib.chemlite_perceive_bonds.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_double, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.chemlite_morgan_ranks.restype = None
        lib.chemlite_morgan_ranks.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
    except OSError as exc:
        logger.debug("chemlite native load failed: %s", exc)
        _lib = None
    return _lib


def perceive_bonds_native(pos: np.ndarray, radii: np.ndarray,
                          tol: float) -> np.ndarray | None:
    """(n, 3) positions + covalent radii -> (m, 2) bonded index pairs."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(radii)
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    radii = np.ascontiguousarray(radii, dtype=np.float64)
    cap = max(64, 8 * n)
    while True:
        out = np.empty((cap, 2), dtype=np.int32)
        m = lib.chemlite_perceive_bonds(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            radii.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, float(tol),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
        if m <= cap:
            return out[:m].copy()
        cap = m + 16


def morgan_ranks_native(init_inv: np.ndarray, bond_a: np.ndarray,
                        bond_b: np.ndarray,
                        bond_order: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    n = len(init_inv)
    init_inv = np.ascontiguousarray(init_inv, dtype=np.int64)
    bond_a = np.ascontiguousarray(bond_a, dtype=np.int32)
    bond_b = np.ascontiguousarray(bond_b, dtype=np.int32)
    bond_order = np.ascontiguousarray(bond_order, dtype=np.int32)
    out = np.empty(n, dtype=np.int32)
    lib.chemlite_morgan_ranks(
        n, init_inv.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(bond_a),
        bond_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bond_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        bond_order.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out
