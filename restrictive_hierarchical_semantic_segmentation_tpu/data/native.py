"""ctypes bridge to the native C++ sample factory (runtime/sample_factory.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is not,
hence the C ABI + ctypes). Falls back silently to the numpy path when the
toolchain or library is unavailable — ``SegDataset`` consults
:func:`available` and the two paths are compared in
``tests/test_native_runtime.py``.

Two-stage API mirroring the kernel split:
* :func:`mask_bits` — augmentation-independent per-pixel channel bitmask
  (fused resize+threshold); **cacheable across epochs**;
* :func:`expand_bits` — per-epoch hflip/affine gather + ternary expansion.
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

_I32P = ctypes.POINTER(ctypes.c_int32)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_U32P = ctypes.POINTER(ctypes.c_uint32)
_F32P = ctypes.POINTER(ctypes.c_float)
_F64P = ctypes.POINTER(ctypes.c_double)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_DIR, "libsample_factory.so")
    src = os.path.join(_DIR, "sample_factory.cpp")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        try:
            subprocess.run(["make", "-B", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            if not os.path.exists(so):
                return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.rhss_mask_bits.restype = ctypes.c_int
    lib.rhss_mask_bits.argtypes = [
        _U8P, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        _I32P, _I32P, ctypes.c_int, _U32P,
    ]
    lib.rhss_expand_bits.restype = ctypes.c_int
    lib.rhss_expand_bits.argtypes = [
        _U32P, ctypes.c_int, ctypes.c_int, _I32P, ctypes.c_int, ctypes.c_int,
        _F64P, _F32P,
    ]
    lib.rhss_expand_bits_i8.restype = ctypes.c_int
    lib.rhss_expand_bits_i8.argtypes = [
        _U32P, ctypes.c_int, ctypes.c_int, _I32P, ctypes.c_int, ctypes.c_int,
        _F64P, ctypes.POINTER(ctypes.c_int8),
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
        self.nvals = np.ascontiguousarray(nvals, np.int32)
        self.vals = np.ascontiguousarray(vals, np.int32)
        self.parent = np.ascontiguousarray(parent, np.int32)
        self.n_channels = len(names)


def mask_bits(mask: np.ndarray, tables: ChannelTables,
              size: int) -> Optional[np.ndarray]:
    """(h, w) uint8 mask -> (size, size) uint32 channel bitmask, or None."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    bits = np.empty((size, size), np.uint32)
    rc = lib.rhss_mask_bits(
        mask.ctypes.data_as(_U8P), h, w, size,
        tables.nvals.ctypes.data_as(_I32P),
        tables.vals.ctypes.data_as(_I32P),
        tables.n_channels,
        bits.ctypes.data_as(_U32P),
    )
    return bits if rc == 0 else None


def expand_bits(bits: np.ndarray, tables: ChannelTables,
                hflip: bool = False,
                affine_matrix: Optional[np.ndarray] = None,
                dtype=np.float32) -> Optional[np.ndarray]:
    """dtype=np.int8 emits ternary targets as int8 ({-1,0,1} are exact):
    4x less host memory traffic and a 4x smaller host->device transfer; the
    jitted steps upcast on device (train/steps.py)."""
    lib = _load()
    if lib is None:
        return None
    size = bits.shape[0]
    out = np.empty((size, size, tables.n_channels), dtype)
    aff = None
    if affine_matrix is not None:
        aff = np.ascontiguousarray(affine_matrix, np.float64).reshape(6)
    fn = lib.rhss_expand_bits_i8 if dtype == np.int8 else lib.rhss_expand_bits
    ptr = (out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))
           if dtype == np.int8 else out.ctypes.data_as(_F32P))
    rc = fn(
        np.ascontiguousarray(bits).ctypes.data_as(_U32P), size,
        tables.n_channels,
        tables.parent.ctypes.data_as(_I32P),
        1 if tables.hierarchical else 0,
        1 if hflip else 0,
        aff.ctypes.data_as(_F64P) if aff is not None else None,
        ptr,
    )
    return out if rc == 0 else None


def make_target_native(
    mask: np.ndarray,
    tables: ChannelTables,
    size: int,
    hflip: bool = False,
    affine_matrix: Optional[np.ndarray] = None,
    bits_cache: Optional[dict] = None,
    cache_key=None,
    dtype=np.float32,
) -> Optional[np.ndarray]:
    """Full fused target build; returns None if the library is unavailable.
    With ``bits_cache``/``cache_key``, the augmentation-independent bitmask is
    reused across epochs."""
    bits = None
    if bits_cache is not None and cache_key is not None:
        bits = bits_cache.get(cache_key)
    if bits is None:
        bits = mask_bits(mask, tables, size)
        if bits is None:
            return None
        if bits_cache is not None and cache_key is not None:
            bits_cache[cache_key] = bits
    return expand_bits(bits, tables, hflip, affine_matrix, dtype=dtype)
