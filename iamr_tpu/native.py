"""ctypes bindings for the native C++ runtime library (native/iamr_native.cpp).

The library provides the host-side machinery the reference implements in
C++ inside AMReX: Berger-Rigoutsos tag clustering (regrid path) and
FArrayBox binary I/O (the VisMF plotfile/checkpoint hot loop). Built on
demand with `make -C native`; callers fall back to the pure-Python paths
when no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "native", "build", "libiamr_native.so")
_SRC = os.path.join(_REPO, "native", "iamr_native.cpp")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["make", "-C", os.path.join(_REPO, "native")],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.iamr_br_cluster.restype = ctypes.c_int
        lib.iamr_br_cluster.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_double,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.iamr_write_fab.restype = ctypes.c_int64
        lib.iamr_write_fab.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.iamr_read_fab.restype = ctypes.c_int
        lib.iamr_read_fab.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def berger_rigoutsos(
    tags: np.ndarray,
    min_width: int = 4,
    min_eff: float = 0.7,
    max_boxes: int = 1024,
) -> List[Tuple[Tuple[int, ...], Tuple[int, ...]]]:
    """Cluster a boolean tag array into boxes covering all tags with
    per-box tagged fraction >= min_eff where splittable.

    Returns a list of (lo, hi) index tuples (hi inclusive). Raises if the
    native library is unavailable (callers guard with available())."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    t = np.ascontiguousarray(tags.astype(np.uint8))
    dim = t.ndim
    shape = np.asarray(t.shape, dtype=np.int64)
    out = np.zeros((max_boxes, 2 * dim), dtype=np.int32)
    n = lib.iamr_br_cluster(
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dim,
        min_width,
        min_eff,
        max_boxes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if n < 0:
        raise RuntimeError("iamr_br_cluster failed")
    return [
        (tuple(int(x) for x in out[i, :dim]), tuple(int(x) for x in out[i, dim:]))
        for i in range(n)
    ]


def write_fab(
    path: str,
    data: np.ndarray,
    lo: Tuple[int, ...],
    hi: Tuple[int, ...],
    append: bool = False,
    typ: Optional[Tuple[int, ...]] = None,
) -> int:
    """Write (ncomp, *n) float64 C-order data as one AMReX-native FAB.

    Returns the FAB-header byte offset (what VisMF _H FabOnDisk lines
    record — AMReX readers seek there and re-parse the header)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    d = np.ascontiguousarray(data, dtype=np.float64)
    ncomp = d.shape[0]
    n = np.asarray(d.shape[1:], dtype=np.int64)
    dim = len(d.shape) - 1
    lo_a = np.asarray(lo, dtype=np.int32)
    hi_a = np.asarray(hi, dtype=np.int32)
    typ_a = np.asarray(typ if typ is not None else (0,) * dim, dtype=np.int32)
    off = lib.iamr_write_fab(
        path.encode(),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dim,
        ncomp,
        lo_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hi_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        1 if append else 0,
        typ_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if off < 0:
        raise IOError(f"iamr_write_fab failed for {path}")
    return int(off)


def read_fab(path: str, offset: int, shape, ncomp: int) -> np.ndarray:
    """Read back a FAB payload into C-order (ncomp, *shape)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = np.asarray(shape, dtype=np.int64)
    out = np.zeros((ncomp,) + tuple(shape), dtype=np.float64)
    rc = lib.iamr_read_fab(
        path.encode(),
        offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(shape),
        ncomp,
    )
    if rc != 0:
        raise IOError(f"iamr_read_fab failed for {path}")
    return out
