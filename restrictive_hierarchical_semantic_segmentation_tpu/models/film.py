"""FiLM top-down conditioning (reference models.py:58-77).

Global-average-pool the previous level's probability map, project with one
Dense layer to per-channel ``(gamma, beta)``, and modulate the backbone
features ``feats * gamma + beta``. The GAP makes the conditioning resolution
independent, so it works identically for UNet (full-res, 64ch) and HRNet
(1/4-res, 720ch) features.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["FiLM"]


class FiLM(nn.Module):
    """feats: (B, H, W, C_feat); cond_map: (B, H', W', C_cond) probabilities."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, cond_map: jnp.ndarray) -> jnp.ndarray:
        c_feat = feats.shape[-1]
        if cond_map.ndim == 4:
            cond_vec = jnp.mean(cond_map, axis=(1, 2))  # GAP -> (B, C_cond)
        else:
            cond_vec = cond_map
        gamma_beta = nn.Dense(2 * c_feat, dtype=self.dtype, name="mlp")(
            cond_vec.astype(self.dtype)
        )
        gamma = gamma_beta[:, :c_feat][:, None, None, :]
        beta = gamma_beta[:, c_feat:][:, None, None, :]
        return feats * gamma + beta
