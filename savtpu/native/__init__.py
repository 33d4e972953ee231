"""Native (C++) runtime kernels, loaded via ctypes with Python fallbacks.

The reference's setup-time heavy lifting lives in native third-party code
(ParMETIS/METIS via mgmetis, Data_prepare.py:94). savtpu ships its own C++
equivalents in ``sav_native.cpp`` — k-way graph partitioning with boundary
refinement plus the O(N)-hash localization kernels that the reference
implements as O(N^2) Python list scans (Tools/Distributed_tools.py:14-73).

The library is built on demand with g++ (no pip deps); every entry point
has a NumPy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libsavnative.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _DIR / "sav_native.cpp"
    if not src.exists():
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _DIR / "sav_native.cpp"
    stale = (
        not _SO.exists()
        or (src.exists() and src.stat().st_mtime > _SO.stat().st_mtime)
    )
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.sav_partition_graph.restype = ctypes.c_int
        lib.sav_partition_graph.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # xadj
            ctypes.POINTER(ctypes.c_int64),  # adjncy
            ctypes.c_int64,                  # n vertices
            ctypes.c_int64,                  # n parts
            ctypes.c_int64,                  # refinement passes
            ctypes.POINTER(ctypes.c_int64),  # out epart
        ]
        lib.sav_partition_refine.restype = ctypes.c_int
        lib.sav_partition_refine.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # xadj
            ctypes.POINTER(ctypes.c_int64),  # adjncy
            ctypes.c_int64,                  # n vertices
            ctypes.c_int64,                  # n parts
            ctypes.c_int64,                  # refinement passes
            ctypes.POINTER(ctypes.c_int64),  # epart in/out
        ]
        lib.sav_first_touch.restype = ctypes.c_int64
        lib.sav_first_touch.argtypes = [
            ctypes.POINTER(ctypes.c_int64),  # flat node ids
            ctypes.c_int64,                  # count
            ctypes.c_int64,                  # n nodes global
            ctypes.POINTER(ctypes.c_int64),  # out unique ids (cap = count)
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_partition(xadj, adjncy, n_parts, refine_passes=8):
    """k-way dual-graph partition via the C++ kernel; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xadj = np.ascontiguousarray(xadj, dtype=np.int64)
    adjncy = np.ascontiguousarray(adjncy, dtype=np.int64)
    n = len(xadj) - 1
    out = np.empty(n, dtype=np.int64)
    rc = lib.sav_partition_graph(
        xadj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        adjncy.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        n_parts,
        refine_passes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out if rc == 0 else None


def native_refine(xadj, adjncy, epart, n_parts, refine_passes=8):
    """FM boundary refinement of a given partition (in a copy); None if
    the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    xadj = np.ascontiguousarray(xadj, dtype=np.int64)
    adjncy = np.ascontiguousarray(adjncy, dtype=np.int64)
    out = np.ascontiguousarray(epart, dtype=np.int64).copy()
    rc = lib.sav_partition_refine(
        xadj.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        adjncy.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(xadj) - 1,
        n_parts,
        refine_passes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out if rc == 0 else None


def native_first_touch(flat_nodes, n_nodes_global):
    """First-appearance dedup of a flat node-id stream; None if no lib."""
    lib = get_lib()
    if lib is None:
        return None
    flat = np.ascontiguousarray(flat_nodes, dtype=np.int64)
    out = np.empty(len(flat), dtype=np.int64)
    cnt = lib.sav_first_touch(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(flat),
        n_nodes_global,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:cnt].copy()
