"""Bilinear resize with explicit corner-alignment semantics.

The reference uses two distinct bilinear conventions that matter for parity:

* ``align_corners=True``  — UNet decoder upsampling (models.py:156) and every
  HRNet interpolation (``config.MODEL.ALIGN_CORNERS`` defaults to True,
  config/default.py:37; used at models.py:536-539, 746, 757, 766, 776).
* ``align_corners=False`` (half-pixel) — torchvision ``Resize(antialias=False)``
  in the data pipeline (dataloaders.py:52).

``jax.image.resize(method='linear')`` implements only the half-pixel
convention, so the aligned variant is built here from first principles.
Two equivalent formulations are provided (selected per call or via
``resize_method``):

* ``"gather"`` — a pair of 1-D gather/lerp passes. Weights/indices are
  computed at trace time from static shapes (no dynamic shapes reach the
  TPU) and XLA fuses the lerp.
* ``"matmul"`` — the same 1-D interpolation expressed as a banded
  ``(out, in)`` matrix contraction per axis. Numerically identical up to
  fp reassociation, but contains **no gather op**: it partitions cleanly
  under every GSPMD configuration (gathers on a sharded axis trip an XLA
  partial-manual partitioner CHECK under the fold x space mesh — see
  train/fold_parallel.py and tools/fold_space_repro.py) and runs on the
  MXU instead of the gather path.

Layout: NHWC (TPU-native — channels on the 128-lane axis).
"""
from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp

__all__ = [
    "resize_bilinear",
    "upsample2x_align_corners",
    "resize_method",
    "get_default_method",
    "set_default_method",
]

# None = resolve per platform on first use: "matmul" on TPU (runs on the MXU
# — measured 0.3622 vs 0.4206 s/step for the full 620px hier-W48 train step,
# BENCHMARKS.md round 4 — and partitions under every GSPMD config), "gather"
# elsewhere (bit-matches the torch oracles in the CPU parity suites).
_DEFAULT_METHOD = None


def get_default_method() -> str:
    global _DEFAULT_METHOD
    if _DEFAULT_METHOD is None:
        import jax

        _DEFAULT_METHOD = ("matmul" if jax.default_backend() == "tpu"
                           else "gather")
    return _DEFAULT_METHOD


def set_default_method(method: str) -> None:
    """Process-wide default formulation; prefer the ``resize_method``
    context manager unless the switch must outlive the current scope."""
    global _DEFAULT_METHOD
    if method not in ("gather", "matmul"):
        raise ValueError(f"unknown resize method {method!r}")
    _DEFAULT_METHOD = method


@contextlib.contextmanager
def resize_method(method: str):
    """Temporarily switch the default resize formulation ("gather"/"matmul").

    The method is resolved *before* the jit boundary (it is a static argument
    of the compiled impl), so compilation caches never mix formulations.
    """
    global _DEFAULT_METHOD
    if method not in ("gather", "matmul"):
        raise ValueError(f"unknown resize method {method!r}")
    prev = _DEFAULT_METHOD
    _DEFAULT_METHOD = method
    try:
        yield
    finally:
        _DEFAULT_METHOD = prev


def _linear_indices_weights(in_size: int, out_size: int, align_corners: bool):
    """Static gather indices + lerp weights for 1-D linear interpolation."""
    import numpy as np

    if out_size == in_size:
        idx0 = np.arange(out_size)
        return idx0, idx0, np.zeros((out_size,), np.float32)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), np.float64)
        else:
            src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size) + 0.5) * scale - 0.5
        src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    return lo, hi, w


def _interp_matrix(in_size: int, out_size: int, align_corners: bool):
    """Static banded (out, in) interpolation matrix: row o holds 1-w at
    lo[o] and w at hi[o] (summing to 1; lo==hi rows collapse to a single 1)."""
    import numpy as np

    lo, hi, w = _linear_indices_weights(in_size, out_size, align_corners)
    rows = np.arange(out_size)
    A = np.zeros((out_size, in_size), np.float32)
    np.add.at(A, (rows, lo), 1.0 - w)
    np.add.at(A, (rows, hi), w)
    return A


def _resize_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool,
                 method: str) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if method == "matmul":
        A = jnp.asarray(_interp_matrix(in_size, out_size, align_corners),
                        x.dtype)
        y = jnp.tensordot(x, A, axes=[[axis], [1]])  # resized dim is now last
        return jnp.moveaxis(y, -1, axis)
    lo, hi, w = _linear_indices_weights(in_size, out_size, align_corners)
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w).reshape(shape).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    return x_lo + (x_hi - x_lo) * w


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _resize_bilinear_impl(x: jax.Array, size: tuple, align_corners: bool,
                          method: str) -> jax.Array:
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = _resize_axis(x, h_axis, size[0], align_corners, method)
    x = _resize_axis(x, w_axis, size[1], align_corners, method)
    return x


def resize_bilinear(x: jax.Array, size: tuple, align_corners: bool = True,
                    method: str | None = None) -> jax.Array:
    """Resize NHWC (or HWC / NHW...) images to ``size=(H, W)`` bilinearly.

    ``align_corners=True`` matches ``torch.nn.functional.interpolate(...,
    mode='bilinear', align_corners=True)``; ``False`` matches the PyTorch /
    torchvision half-pixel convention (verified against torch CPU oracles in
    ``tests/test_ops.py``). ``method`` (default: the ``resize_method``
    context; initially "matmul" on TPU, "gather" elsewhere — see
    ``_DEFAULT_METHOD``) picks the gather/lerp or the gather-free
    banded-matmul formulation — same math, different XLA ops.
    """
    return _resize_bilinear_impl(x, size, align_corners,
                                 method or get_default_method())


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, align_corners=True (UNet decoder, models.py:156)."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), True)
