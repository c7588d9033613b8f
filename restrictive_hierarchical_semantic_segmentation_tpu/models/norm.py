"""Bandwidth-lean BatchNorm for bf16 training.

Drop-in replacement for ``flax.linen.BatchNorm`` (identical parameter and
``batch_stats`` variable layout: ``scale``/``bias`` params, ``mean``/``var``
stats — so torch donor import and checkpoints are unaffected) that fixes the
round-1-diagnosed HBM amplification (BENCHMARKS.md "where the time goes"):

flax's ``_compute_stats``/``_normalize`` upcast the FULL activation tensor to
float32 (``x.astype(f32)`` for the stats; ``y = x - mean`` promotes for the
normalize) and the f32 copies become materialized fusion boundaries around
every conv. Here the statistics are still accumulated in f32 (a fused
convert+reduce reads the bf16 tensor once, no f32 copy lands in HBM), but the
normalization itself is folded per channel into

    a = scale / sqrt(var + eps)          (f32 math, cast to compute dtype)
    b = bias - mean * a
    y = x * a + b                        (pure compute-dtype elementwise)

so the only big-tensor ops are bf16. Eval mode gets BN folding for free
(``a``/``b`` from running stats — one FMA per element, fusable into the conv
epilogue).

Semantics notes:
* running var stores the *unbiased* batch variance (``var * n/(n-1)``) — the
  torch convention the reference trained with (flax stores the biased one;
  the difference is only ~2.6e-6 at 620^2 activations but matching torch
  exactly lets the train-mode parity test pin the D-times-EMA behavior
  bit-for-bit — tests/test_reference_parity_hrnet.py); normalization itself
  uses the biased variance, as both frameworks do;
* EMA: ``ra = momentum * ra + (1-momentum) * batch`` with momentum 0.9
  == torch BN_MOMENTUM=0.1 (reference models.py:318);
* statistics are computed over the logically-global batch under jit/SPMD —
  SyncBatchNorm parity (reference bn_helper.py:10) with zero transport code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["LeanBatchNorm", "BN_MOMENTUM"]

BN_MOMENTUM = 0.9  # torch 0.1 (reference models.py:318)


class LeanBatchNorm(nn.Module):
    """BatchNorm over the last (channel) axis of an NHWC tensor."""

    use_running_average: bool
    momentum: float = BN_MOMENTUM
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)  # fuses into the reduces below
            mean = jnp.mean(x32, axes)
            mean2 = jnp.mean(jnp.square(x32), axes)
            var = jnp.maximum(0.0, mean2 - jnp.square(mean))
            if not self.is_initializing():
                m = self.momentum
                n = 1
                for ax in axes:
                    n *= x.shape[ax]
                bessel = n / (n - 1) if n > 1 else 1.0  # torch unbiased var
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (var * bessel)

        a32 = scale * jax.lax.rsqrt(var + self.epsilon)
        b32 = bias - mean * a32
        a = a32.astype(self.dtype)
        b = b32.astype(self.dtype)
        return x.astype(self.dtype) * a + b
