"""ctypes bridge to the native C++ sample factory (runtime/sample_factory.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is not,
hence the C ABI + ctypes). Falls back silently to the numpy path when the
toolchain or library is unavailable — ``SegDataset`` consults
:func:`available` and the two paths are compared bit-for-bit in
``tests/test_native_runtime.py``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

from ..hierarchy.tree import ClassTree

_LIB = None
_TRIED = False
_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runtime")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_DIR, "libsample_factory.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.rhss_make_target.restype = ctypes.c_int
    lib.rhss_make_target.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


class ChannelTables:
    """Per-channel pixel-value sets + parent links, precomputed once."""

    def __init__(self, tree: ClassTree, hierarchical: bool):
        self.hierarchical = hierarchical
        names = tree.names if hierarchical else tree.leaf_names
        nvals: List[int] = []
        vals: List[int] = []
        parent: List[int] = []
        desc = dict(zip(tree.parent_names_bfs, tree.descendant_leaves))
        chan_index = {n: i for i, n in enumerate(names)}
        for n in names:
            if tree.children[n]:
                pvs = [tree.pixel_value[tree.leaf_names[i]] for i in desc[n]]
            else:
                pvs = [tree.pixel_value[n]]
            nvals.append(len(pvs))
            vals.extend(int(v) for v in pvs)
            p = tree.parent_name.get(n)
            parent.append(chan_index[p] if (hierarchical and p in chan_index)
                          else -1)
        self.nvals = np.asarray(nvals, np.int32)
        self.vals = np.asarray(vals, np.int32)
        self.parent = np.asarray(parent, np.int32)
        self.n_channels = len(names)


def make_target_native(
    mask: np.ndarray,
    tables: ChannelTables,
    size: int,
    hflip: bool = False,
    affine_matrix: Optional[np.ndarray] = None,
) -> Optional[np.ndarray]:
    """Full fused target build; returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    out = np.empty((size, size, tables.n_channels), np.float32)
    aff = None
    if affine_matrix is not None:
        aff = np.ascontiguousarray(affine_matrix, np.float64).reshape(6)
    rc = lib.rhss_make_target(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, size,
        tables.nvals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tables.vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tables.n_channels,
        tables.parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        1 if tables.hierarchical else 0,
        1 if hflip else 0,
        aff.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if aff is not None
        else None,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None
