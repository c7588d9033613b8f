"""Pallas fused BatchNorm+activation — the TPU-native counterpart of the
reference's vendored InPlace-ABN C++/CUDA extension (Models/functions.py:8-131,
Models/bn.py:17-178; sources absent from the repo and dead in practice, see
SURVEY.md §2.13).

What the CUDA extension fused, and what this provides on TPU:

* ``mean_var``      -> :func:`bn_stats` — one-pass per-channel sum/sum-of-squares
  over (N, H, W) tiles, one HBM read of x instead of two;
* ``forward``       -> :func:`fused_scale_bias_act` — normalize+affine+activation
  in one VMEM-resident elementwise pass (the inference/serving hot path);
* ``edz_eydz`` + ``backward`` -> the custom VJP of :func:`fused_bn_act` —
  a single backward kernel producing (dx, dgamma, dbeta) with the
  InPlace-ABN reduction identities;
* cross-GPU stat exchange (functions.py:157-230 queues + ``torch.cuda.comm``)
  -> nothing: under jit/SPMD the batch dimension is globally sharded and XLA
  emits the ``psum`` over ICI for the stats reductions automatically.

The XLA-fused ``flax.linen.BatchNorm`` path remains the default (XLA fuses BN
chains well); these kernels are the explicitly-scheduled variant for the
serving path and a template for further conv+BN+act fusion. Parity is tested
against flax/torch in ``tests/test_pallas_bn.py`` (interpret mode on CPU,
compiled on TPU).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bn_stats", "fused_scale_bias_act", "fused_bn_act", "batch_norm_act"]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"



def _vmem_tile(n: int, c: int, requested: int) -> int:
    """Rows per tile bounded so all in/out/double-buffered blocks fit VMEM
    (~16MB/core): ~8 f32 blocks of (tile, c) -> tile <= 2^18 / c rows."""
    cap = max(128, ((1 << 18) // max(c, 1)) // 8 * 8)  # sublane multiple of 8
    return int(min(requested, n, cap))


# --------------------------------------------------------------------- stats
def _stats_kernel(x_ref, sum_ref, sq_ref):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    part_sum = jnp.sum(x, axis=0)
    part_sq = jnp.sum(x * x, axis=0)

    @pl.when(i == 0)
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        sq_ref[...] = jnp.zeros_like(sq_ref)

    sum_ref[...] += part_sum
    sq_ref[...] += part_sq


@functools.partial(jax.jit, static_argnums=(1,))
def bn_stats(x: jax.Array, rows_per_tile: int = 1024) -> Tuple[jax.Array, jax.Array]:
    """Per-channel (mean, var) of NHWC ``x`` in one pass (biased variance, as
    torch BN uses for normalization). Shapes: x (..., C) -> ((C,), (C,))."""
    c = x.shape[-1]
    flat = x.reshape(-1, c)
    n = flat.shape[0]
    tile = _vmem_tile(n, c, rows_per_tile)
    grid = pl.cdiv(n, tile)
    pad = grid * tile - n
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    s, sq = pl.pallas_call(
        _stats_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        interpret=_interpret(),
    )(flat)
    mean = s / n
    var = sq / n - mean * mean
    return mean, jnp.maximum(var, 0.0)


# ------------------------------------------------------------- fused fwd/act
def _scale_bias_act_kernel(x_ref, scale_ref, shift_ref, o_ref, *, act):
    y = x_ref[...].astype(jnp.float32) * scale_ref[...] + shift_ref[...]
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    elif act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.01 * y)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4))
def fused_scale_bias_act(
    x: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    act: str = "relu",
    rows_per_tile: int = 1024,
) -> jax.Array:
    """``act(x * scale + shift)`` with per-channel scale/shift — the folded
    inference BN+activation (functions.py:75-131 forward semantics)."""
    c = x.shape[-1]
    orig_shape = x.shape
    flat = x.reshape(-1, c)
    n = flat.shape[0]
    tile = _vmem_tile(n, c, rows_per_tile)
    grid = pl.cdiv(n, tile)
    pad = grid * tile - n
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_scale_bias_act_kernel, act=act),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(flat.shape, x.dtype),
        interpret=_interpret(),
    )(flat, scale.astype(jnp.float32), shift.astype(jnp.float32))
    if pad:
        out = out[:n]
    return out.reshape(orig_shape)


# ----------------------------------------------------- train-mode custom VJP
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_bn_act(x, mean, var, gamma, beta, eps=1e-5, act="relu"):
    """Training-mode fused ``act(gamma * (x-mean)/sqrt(var+eps) + beta)``
    (``act``: "relu" | "none").

    Forward runs the Pallas fused pass; backward uses the InPlace-ABN
    reduction identities (functions.py:210-230):
      edz = sum(dy), eydz = sum(dy * xhat)  over N,H,W
      dgamma = eydz, dbeta = edz
      dx = gamma * rstd * (dy - (xhat * eydz + edz) / count)
    """
    rstd = jax.lax.rsqrt(var + eps)
    return fused_scale_bias_act(
        x, gamma * rstd, beta - mean * gamma * rstd, act
    )


def _fba_fwd(x, mean, var, gamma, beta, eps, act):
    y = fused_bn_act(x, mean, var, gamma, beta, eps, act)
    # save ONLY x (+ per-channel scalars): y/xhat are recomputed in the
    # backward kernel — keeping y as a residual doubled activation memory
    # per BN and OOM'd HBM at batch 16 / 620px
    return y, (x, mean, var, gamma, beta)


def _bwd_kernel(x_ref, g_ref, scale_ref, shift_ref, mean_ref, rstd_ref,
                dy_ref, edz_ref, eydz_ref, *, act):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    if act == "relu":
        z = x * scale_ref[...] + shift_ref[...]  # recompute pre-act output
        dy = jnp.where(z > 0, g, 0.0)
    else:
        dy = g
    xhat = (x - mean_ref[...]) * rstd_ref[...]
    dy_ref[...] = dy.astype(dy_ref.dtype)

    @pl.when(i == 0)
    def _():
        edz_ref[...] = jnp.zeros_like(edz_ref)
        eydz_ref[...] = jnp.zeros_like(eydz_ref)

    edz_ref[...] += jnp.sum(dy, axis=0)
    eydz_ref[...] += jnp.sum(dy * xhat, axis=0)


def _fba_bwd(eps, act, res, g):
    x, mean, var, gamma, beta = res
    c = x.shape[-1]
    n = x.size // c
    rstd = jax.lax.rsqrt(var + eps)
    scale = (gamma * rstd).astype(jnp.float32)
    shift = (beta - mean * gamma * rstd).astype(jnp.float32)

    flat_x = x.reshape(-1, c)
    flat_g = g.reshape(-1, c)
    tile = _vmem_tile(n, c, 1024)
    grid = pl.cdiv(n, tile)
    pad = grid * tile - n
    if pad:
        flat_x = jnp.pad(flat_x, ((0, pad), (0, 0)))
        flat_g = jnp.pad(flat_g, ((0, pad), (0, 0)))
    dy, edz, eydz = pl.pallas_call(
        functools.partial(_bwd_kernel, act=act),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(flat_g.shape, jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
            jax.ShapeDtypeStruct((c,), jnp.float32),
        ),
        interpret=_interpret(),
    )(flat_x, flat_g, scale, shift,
      mean.astype(jnp.float32), rstd.astype(jnp.float32))
    if pad:
        dy = dy[:n]
    dy = dy.reshape(x.shape)
    # train-mode dx (mean/var are functions of x); xhat recomputed — XLA
    # fuses this elementwise chain with the kernel output
    xhat = (x.astype(jnp.float32) - mean) * rstd
    dx = (gamma * rstd) * (
        dy - (xhat * eydz + edz) / n
    )
    dmean = jnp.zeros_like(mean)  # folded into dx above
    dvar = jnp.zeros_like(var)
    return (dx.astype(x.dtype), dmean, dvar, eydz, edz)


fused_bn_act.defvjp(_fba_fwd, _fba_bwd)


def batch_norm_act(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                   eps: float = 1e-5,
                   act: str = "relu") -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Train-mode fused BN+ReLU from raw activations: one-pass Pallas stats +
    fused normalize/affine/act, returning (y, mean, var) so callers can update
    running statistics. Gradients through the batch statistics are folded into
    the custom VJP's train-mode dx identity (InPlace-ABN semantics), so the
    stats outputs are detached here — do NOT re-differentiate through them."""
    # stop_gradient on the INPUT: no tangents may enter the stats pallas_call
    # (pallas kernels are not JVP-transformable; the stats' contribution to
    # dx is already in fused_bn_act's custom VJP)
    mean, var = bn_stats(jax.lax.stop_gradient(x))
    return fused_bn_act(x, mean, var, gamma, beta, eps, act), mean, var
