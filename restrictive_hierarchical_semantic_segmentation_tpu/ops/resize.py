"""Bilinear resize with explicit corner-alignment semantics.

The reference uses two distinct bilinear conventions that matter for parity:

* ``align_corners=True``  — UNet decoder upsampling (models.py:156) and every
  HRNet interpolation (``config.MODEL.ALIGN_CORNERS`` defaults to True,
  config/default.py:37; used at models.py:536-539, 746, 757, 766, 776).
* ``align_corners=False`` (half-pixel) — torchvision ``Resize(antialias=False)``
  in the data pipeline (dataloaders.py:52).

``jax.image.resize(method='linear')`` implements only the half-pixel
convention, so the aligned variant is built here from first principles as a
pair of 1-D gather/lerp passes. Separable 1-D passes keep the op cheap and let
XLA fuse the weight multiplies; weights are computed at trace time from static
shapes (no dynamic shapes reach the TPU).

Layout: NHWC (TPU-native — channels on the 128-lane axis).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["resize_bilinear", "upsample2x_align_corners"]


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


def _resize_axis(x: jax.Array, axis: int, out_size: int, align_corners: bool) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    lo, hi, w = _linear_indices_weights(in_size, out_size, align_corners)
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(w).reshape(shape).astype(x.dtype)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    return x_lo + (x_hi - x_lo) * w


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bilinear(x: jax.Array, size: tuple, align_corners: bool = True) -> jax.Array:
    """Resize NHWC (or HWC / NHW...) images to ``size=(H, W)`` bilinearly.

    ``align_corners=True`` matches ``torch.nn.functional.interpolate(...,
    mode='bilinear', align_corners=True)``; ``False`` matches the PyTorch /
    torchvision half-pixel convention (verified against torch CPU oracles in
    ``tests/test_ops.py``).
    """
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = _resize_axis(x, h_axis, size[0], align_corners)
    x = _resize_axis(x, w_axis, size[1], align_corners)
    return x


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, align_corners=True (UNet decoder, models.py:156)."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), True)
