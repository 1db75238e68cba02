"""ctypes binding for the native (C++) neighbor-list core.

Compiles ``native/neighborlist.cpp`` on first use (g++ -O3 -shared) into
the package directory and falls back to the pure-Python KD-tree
implementation when a toolchain is unavailable.  The native path is the
hot host-side loop of MD and dataset preprocessing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so_path = os.path.join(here, '_libsevennl.so')
    src = os.path.join(_repo_root(), 'native', 'neighborlist.cpp')
    if not os.path.exists(so_path) or (
        os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(so_path)
    ):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ['g++', '-O3', '-march=native', '-shared', '-fPIC',
                 src, '-o', so_path],
                check=True, capture_output=True, timeout=120,
            )
        except (OSError, subprocess.SubprocessError) as e:
            warnings.warn(f'native neighbor list unavailable: {e}')
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        warnings.warn(f'native neighbor list failed to load: {e}')
        return None
    lib.sevennl_build.restype = ctypes.c_longlong
    lib.sevennl_build.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.c_double, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def neighbor_list_native(
    pos: np.ndarray,
    cell: np.ndarray,
    pbc,
    cutoff: float,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Same contract as data.neighborlist.neighbor_list; None if the
    native core is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    cell = np.ascontiguousarray(cell, dtype=np.float64).reshape(3, 3)
    if isinstance(pbc, bool):
        pbc = (pbc, pbc, pbc)
    pbc_arr = np.ascontiguousarray(
        [1 if p else 0 for p in pbc], dtype=np.int32
    )
    n = len(pos)
    cap = max(1024, n * 64)
    while True:
        out_i = np.empty(cap, np.int32)
        out_j = np.empty(cap, np.int32)
        out_s = np.empty((cap, 3), np.float64)
        got = lib.sevennl_build(
            pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
            cell.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            pbc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            float(cutoff), cap,
            out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_j.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            out_s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if got == -1:
            return None
        if got < 0:
            cap = int(-got) + 64
            continue
        m = int(got)
        vec = pos[out_j[:m]] + out_s[:m] @ cell - pos[out_i[:m]]
        return (
            out_i[:m].astype(np.int64), out_j[:m].astype(np.int64),
            out_s[:m], vec,
        )
