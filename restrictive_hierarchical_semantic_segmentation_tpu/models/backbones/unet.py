"""UNet donor backbone, TPU-native (NHWC, Flax linen).

Capability-equivalent to the reference's classic 4-down/4-up UNet
(models.py:108-255): (conv3x3-BN-ReLU)x2 blocks, 2x2 max-pool encoder,
bilinear align_corners=True decoder with pad-to-match skip concatenation,
channel plan 64-128-256-512-512, final 64-channel feature map.

Differences from the torch original (deliberate, TPU-first):
* NHWC layout (channels ride the 128-lane axis; convs tile onto the MXU);
* optional bf16 compute dtype with fp32 params/statistics;
* BatchNorm statistics are computed over the *global* (logically-sharded)
  batch under jit/SPMD — the honest equivalent of SyncBatchNorm
  (bn_helper.py:10) with zero extra code.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import upsample2x_align_corners
from ..norm import LeanBatchNorm

__all__ = ["UNetBackbone"]


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) * 2 — reference models.py:108-123."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        from jax.ad_checkpoint import checkpoint_name

        for i in range(2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}"
            )(x)
            # tag for the remat="conv" policy (no-op outside remat regions)
            x = checkpoint_name(x, "conv_out")
            x = LeanBatchNorm(
                use_running_average=not train,
                dtype=self.dtype,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


class Down(nn.Module):
    """maxpool2 + DoubleConv — reference models.py:136-146."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_ch, self.dtype, name="conv")(x, train)


class Up(nn.Module):
    """bilinear 2x up + pad-to-match + concat(skip, x) + DoubleConv —
    reference models.py:149-174."""

    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        x1 = upsample2x_align_corners(x1)
        # pad x1 spatially to x2's size (zero pad split front/back as torch)
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        if dh or dw:
            x1 = jnp.pad(
                x1,
                ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)),
            )
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_ch, self.dtype, name="conv")(x, train)


class UNetBackbone(nn.Module):
    """Single UNet pass -> (B, H, W, 64) decoder features (models.py:244-255)."""

    dtype: jnp.dtype = jnp.float32
    base_ch: int = 64

    # Static interface consumed by the hierarchical wrapper:
    feature_stride: int = 1  # features are at input resolution

    @property
    def feature_dim(self) -> int:
        return self.base_ch

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.base_ch
        x1 = DoubleConv(c, self.dtype, name="inc")(x, train)
        x2 = Down(c * 2, self.dtype, name="down1")(x1, train)
        x3 = Down(c * 4, self.dtype, name="down2")(x2, train)
        x4 = Down(c * 8, self.dtype, name="down3")(x3, train)
        x5 = Down(c * 8, self.dtype, name="down4")(x4, train)
        d = Up(c * 4, self.dtype, name="up1")(x5, x4, train)
        d = Up(c * 2, self.dtype, name="up2")(d, x3, train)
        d = Up(c, self.dtype, name="up3")(d, x2, train)
        d = Up(c, self.dtype, name="up4")(d, x1, train)
        return d
