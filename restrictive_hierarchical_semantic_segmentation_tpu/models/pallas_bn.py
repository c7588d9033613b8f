"""PallasBatchNormAct: drop-in BatchNorm(+activation) backed by the Pallas
fused kernels — the production integration of ``ops/fused_bn_act.py`` (the
TPU-native InPlace-ABN, SURVEY §2.13).

Variable layout matches ``flax.linen.BatchNorm`` (params: scale/bias;
batch_stats: mean/var) so checkpoints and the donor importer are agnostic to
which implementation produced them.

Train mode: one-pass Pallas batch statistics + fused normalize/affine/act with
the InPlace-ABN custom VJP; running stats updated with the same EMA as flax
(momentum 0.9 == torch 0.1). Eval mode: BN folded into a single fused
scale-bias-act pass.

Scope note: the Pallas statistics reduce over the LOCAL shard. Under a
batch-sharded mesh this is per-replica BN (torch's default BatchNorm2d),
whereas the XLA path gives global-batch statistics (SyncBatchNorm). Both
semantics exist in the reference family (bn_helper.py chooses SyncBN on
torch>=1.0; plain BN in the UNet). Select with ``use_pallas_bn`` on the
backbones; default False keeps SyncBN-parity XLA BN.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fused_bn_act import batch_norm_act, fused_scale_bias_act

__all__ = ["PallasBatchNormAct"]


class PallasBatchNormAct(nn.Module):
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    act: str = "none"                 # "relu" | "none"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        if self.use_running_average:
            rstd = jax.lax.rsqrt(ra_var.value + self.epsilon)
            return fused_scale_bias_act(
                x, scale * rstd, bias - ra_mean.value * scale * rstd, self.act
            ).astype(self.dtype)

        y, mean, var = batch_norm_act(x, scale, bias, self.epsilon, self.act)
        if not self.is_initializing():
            m = self.momentum
            n = 1
            for ax in range(x.ndim - 1):
                n *= x.shape[ax]
            bessel = n / (n - 1) if n > 1 else 1.0  # torch unbiased running
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * (var * bessel)
        return y.astype(self.dtype)
