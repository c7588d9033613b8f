"""HRNet donor backbone, TPU-native (NHWC, Flax linen).

Capability-equivalent to the reference's vendored HRNet-Semantic-Segmentation
(models.py:318-749): stride-4 stem, Bottleneck stage1, multi-resolution
stages 2-4 built from ``HighResolutionModule`` (parallel branches + full
exchange/fusion), transition layers, and the final upsample-concat of all
branches (48+96+192+384 = 720 channels for W48) through a shared 1x1
conv-BN-ReLU head.

TPU-first deltas: NHWC layout, optional bf16 compute dtype, SPMD-global
BatchNorm statistics (SyncBatchNorm parity for free under jit), and the
branch/fusion loops fully unrolled at trace time (static topology from
``HRNetConfig``) so XLA sees one flat graph of large convs.
"""
from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...config.hrnet import HRNetConfig, HRNetStage
from ...ops.resize import resize_bilinear
from ..norm import LeanBatchNorm

__all__ = ["HRNetBackbone"]


def _bn_act(x, dtype, train, name, act="none", pallas=False):
    """BatchNorm followed by an optional fused activation.

    pallas=False: LeanBatchNorm (global-batch stats under SPMD == SyncBN;
    bf16-folded normalization — see models/norm.py) + relu. pallas=True: the
    fused Pallas kernel path (models/pallas_bn.py), identical variable layout.

    Every ``_bn_act`` input is a conv output; tagging it here lets the
    ``remat="conv"`` policy (save conv outputs, recompute the elementwise
    BN/relu tail in backward) cover the whole backbone from one place.
    The tag is a no-op outside a policy-remat region."""
    from jax.ad_checkpoint import checkpoint_name

    x = checkpoint_name(x, "conv_out")
    if pallas:
        from ..pallas_bn import PallasBatchNormAct

        return PallasBatchNormAct(use_running_average=not train, act=act,
                                  dtype=dtype, name=name)(x)
    x = LeanBatchNorm(use_running_average=not train, dtype=dtype, name=name)(x)
    return nn.relu(x) if act == "relu" else x


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN + residual (models.py:327-356). expansion=1."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.planes, (3, 3), (self.stride,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = _bn_act(y, self.dtype, train, "bn1", "relu", self.pallas_bn)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = _bn_act(y, self.dtype, train, "bn2", "none", self.pallas_bn)
        if self.downsample:
            residual = nn.Conv(self.planes, (1, 1), (self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _bn_act(residual, self.dtype, train, "downsample_bn",
                               "none", self.pallas_bn)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1/3x3/1x1 bottleneck + residual (models.py:359-397). expansion=4."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = _bn_act(y, self.dtype, train, "bn1", "relu", self.pallas_bn)
        y = nn.Conv(self.planes, (3, 3), (self.stride,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = _bn_act(y, self.dtype, train, "bn2", "relu", self.pallas_bn)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = _bn_act(y, self.dtype, train, "bn3", "none", self.pallas_bn)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1), (self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = _bn_act(residual, self.dtype, train, "downsample_bn",
                               "none", self.pallas_bn)
        return nn.relu(y + residual)


_BLOCKS = {"BASIC": (BasicBlock, 1), "BOTTLENECK": (Bottleneck, 4)}


class SharedHead1x1(nn.Module):
    """The shared 1x1 conv head (models.py:613-617) with two mathematically
    identical formulations selected by ``mode``:

    * ``concat`` — the reference dataflow: upsample every branch to the
      highest resolution, concatenate to ``in_ch`` channels, one 1x1 conv.
    * ``sum`` — algebraic decomposition: a 1x1 conv is channel-linear and
      bilinear resize is spatial-linear, so the two commute exactly:
      ``conv(concat_i up(b_i)) == sum_i up_or_id(conv_i(b_i))`` where
      ``conv_i`` uses the i-th channel-slice of the same kernel. Per branch
      we pick conv-at-native-resolution vs conv-after-resize by a static
      FLOP estimate — for W48@620px this cuts the head conv from 24.9 to
      ~8 GFLOP/image/pass and deletes the 720-channel concat.

    MEASURED (round 5, 620px b16 bf16 train step): ``sum`` LOSES despite the
    3x FLOP cut — 0.447 s/step vs ``concat``'s 0.357. The conv-first branches
    each materialize a full-resolution ``out_ch``-channel tensor
    ((16,155,155,720) bf16 = 553 MB) before the adds, where concat writes ONE
    such tensor; the extra peak-HBM pressure also feeds XLA's auto-remat.
    FLOPs were never the head's bottleneck — bandwidth is. ``concat`` is
    therefore the default; ``sum`` stays selectable (RHSS_HRNET_HEAD=sum) and
    parity-tested, and is the right dataflow when ``out_ch`` is small
    relative to ``sum(in_ch)`` (the FLOP/bandwidth ratio flips).

    The parameters are one ``(1, 1, in_ch, out_ch)`` kernel + ``(out_ch,)``
    bias with the SAME names/shapes/init as ``nn.Conv`` used through round 4,
    so checkpoints, donor imports, and exports are interchangeable between
    modes.
    """

    in_ch: int
    out_ch: int
    align_corners: bool
    mode: str = "concat"
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def _resize_flops(ch, src_hw, dst_hw):
        """Matmul-resize estimate: rows pass then cols pass."""
        (h, w), (H, W) = src_hw, dst_hw
        return ch * (H * w * h + H * W * w)

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], target_hw) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_ch, self.out_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,),
                          jnp.float32)
        k2d = kernel[0, 0].astype(self.dtype)   # (in_ch, out_ch)
        H, W = target_hw
        ac = self.align_corners

        if self.mode == "concat":
            outs = [xs[0]] + [resize_bilinear(b, (H, W), ac) for b in xs[1:]]
            x = jnp.concatenate(outs, axis=-1).astype(self.dtype)
            return jnp.einsum("bhwc,co->bhwo", x, k2d) + bias.astype(self.dtype)

        y = None
        lo = 0
        for b in xs:
            ch = b.shape[-1]
            ks = k2d[lo:lo + ch]
            lo += ch
            src_hw = b.shape[1:3]
            if tuple(src_hw) == (H, W):
                t = jnp.einsum("bhwc,co->bhwo", b.astype(self.dtype), ks)
            else:
                conv_first = (
                    ch * src_hw[0] * src_hw[1] * self.out_ch
                    + self._resize_flops(self.out_ch, src_hw, (H, W))
                ) < ch * H * W * self.out_ch
                if conv_first:
                    t = jnp.einsum("bhwc,co->bhwo", b.astype(self.dtype), ks)
                    t = resize_bilinear(t, (H, W), ac)
                else:
                    t = resize_bilinear(b, (H, W), ac)
                    t = jnp.einsum("bhwc,co->bhwo", t.astype(self.dtype), ks)
            y = t if y is None else y + t
        return y + bias.astype(self.dtype)


class Branch(nn.Module):
    """A sequence of residual blocks at one resolution (models.py:438-460)."""

    block: str
    num_blocks: int
    planes: int
    dtype: jnp.dtype = jnp.float32
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        cls, expansion = _BLOCKS[self.block]
        out_ch = self.planes * expansion
        for i in range(self.num_blocks):
            ds = i == 0 and x.shape[-1] != out_ch
            x = cls(self.planes, 1, ds, self.dtype,
                    pallas_bn=self.pallas_bn, name=f"block{i}")(x, train)
        return x


class FuseLayer(nn.Module):
    """Exchange unit: branch j -> branch i (models.py:471-515).

    j > i: 1x1 conv + BN, bilinear upsample to i's resolution.
    j < i: (i-j) stride-2 3x3 conv+BN (ReLU on all but the last).
    """

    i: int
    j: int
    out_ch: int
    through_ch: int
    align_corners: bool
    dtype: jnp.dtype = jnp.float32
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, x, target_hw, train: bool):
        i, j = self.i, self.j
        if j > i:
            x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv")(x)
            x = _bn_act(x, self.dtype, train, "bn", "none", self.pallas_bn)
            return resize_bilinear(x, tuple(target_hw), self.align_corners)
        for k in range(i - j):
            last = k == i - j - 1
            ch = self.out_ch if last else self.through_ch
            x = nn.Conv(ch, (3, 3), (2, 2), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{k}")(x)
            x = _bn_act(x, self.dtype, train, f"bn{k}",
                        "none" if last else "relu", self.pallas_bn)
        return x


class HighResolutionModule(nn.Module):
    """Parallel branches + full fusion (models.py:400-544)."""

    stage: HRNetStage
    channels: Sequence[int]     # per-branch channel counts (post-expansion)
    align_corners: bool
    multi_scale_output: bool = True
    dtype: jnp.dtype = jnp.float32
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        nb = self.stage.num_branches
        if nb == 1:
            return [Branch(self.stage.block, self.stage.num_blocks[0],
                           self.stage.num_channels[0], self.dtype,
                           pallas_bn=self.pallas_bn,
                           name="branch0")(xs[0], train)]
        xs = [
            Branch(self.stage.block, self.stage.num_blocks[i],
                   self.stage.num_channels[i], self.dtype,
                   pallas_bn=self.pallas_bn,
                   name=f"branch{i}")(xs[i], train)
            for i in range(nb)
        ]
        n_out = nb if self.multi_scale_output else 1
        outs = []
        for i in range(n_out):
            y = None
            hw = xs[i].shape[1:3]
            for j in range(nb):
                if j == i:
                    t = xs[j]
                else:
                    t = FuseLayer(i, j, self.channels[i], self.channels[j],
                                  self.align_corners, self.dtype,
                                  pallas_bn=self.pallas_bn,
                                  name=f"fuse{i}_{j}")(xs[j], hw, train)
                y = t if y is None else y + t
            outs.append(nn.relu(y))
        return outs


class Transition(nn.Module):
    """Stage transition (models.py:682-705): channel match at existing
    resolutions, strided convs to open new (lower-res) branches."""

    prev_channels: Sequence[int]
    cur_channels: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    pallas_bn: bool = False

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray], train: bool) -> List[jnp.ndarray]:
        outs = []
        n_pre = len(self.prev_channels)
        for i, ch in enumerate(self.cur_channels):
            if i < n_pre:
                if self.prev_channels[i] != ch:
                    y = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                                dtype=self.dtype, name=f"t{i}_conv")(xs[i])
                    y = _bn_act(y, self.dtype, train, f"t{i}_bn", "relu",
                                self.pallas_bn)
                    outs.append(y)
                else:
                    outs.append(xs[i])
            else:
                y = xs[-1]
                for j in range(i + 1 - n_pre):
                    out_ch = ch if j == i - n_pre else self.prev_channels[-1]
                    y = nn.Conv(out_ch, (3, 3), (2, 2), padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"t{i}_conv{j}")(y)
                    y = _bn_act(y, self.dtype, train, f"t{i}_bn{j}", "relu",
                                self.pallas_bn)
                outs.append(y)
        return outs


class HRNetBackbone(nn.Module):
    """Full HRNet pass -> (B, H/4, W/4, 720) fused features
    (models.py:707-749 ``_forward_backbone``)."""

    config: HRNetConfig
    dtype: jnp.dtype = jnp.float32
    # rematerialization of each HighResolutionModule in backward:
    #   False/None — save everything (XLA default);
    #   "module"/True — full recompute per module (max memory savings,
    #     measured +19% step time at 620px/b16 round 1);
    #   "conv" — policy remat: SAVE conv outputs, recompute only the
    #     elementwise BN/relu/add tails (~halves saved activations at a few
    #     % recompute FLOPs — the bandwidth-sweet spot).
    # (whole-backbone remat regions overwhelm this environment's remote TPU
    # compiler at 620px, hence per-module granularity for all modes)
    remat: object = False
    # fused Pallas BN+act kernels instead of XLA flax BN (per-replica stats;
    # see models/pallas_bn.py scope note)
    use_pallas_bn: bool = False
    # shared-head dataflow: "concat" (one fused-concat materialization — the
    # measured-faster default, see SharedHead1x1) | "sum" (decomposed
    # conv-resize commutation; fewer FLOPs, more peak HBM — loses at W48);
    # "auto" resolves via RHSS_HRNET_HEAD env (default "concat"). Both modes
    # read/write the identical parameter tree.
    head_mode: str = "auto"

    feature_stride: int = 4  # features at 1/4 input resolution

    @property
    def feature_dim(self) -> int:
        return self.config.last_channels

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        ac = cfg.align_corners

        # stem: two stride-2 3x3 convs (models.py:578-585)
        for i in range(2):
            x = nn.Conv(64, (3, 3), (2, 2), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"stem_conv{i}")(x)
            x = _bn_act(x, self.dtype, train, f"stem_bn{i}", "relu",
                        self.use_pallas_bn)

        # stage 1: Bottleneck layer1 (models.py:587-588, 652-663)
        s1 = cfg.stage1
        _, exp1 = _BLOCKS[s1.block]
        x = Branch(s1.block, s1.num_blocks[0], s1.num_channels[0], self.dtype,
                   pallas_bn=self.use_pallas_bn, name="layer1")(x, train)
        prev_channels = [s1.num_channels[0] * exp1]

        xs = [x]
        for si, stage in enumerate((cfg.stage2, cfg.stage3, cfg.stage4), start=2):
            _, exp = _BLOCKS[stage.block]
            cur_channels = [c * exp for c in stage.num_channels]
            xs = Transition(tuple(prev_channels), tuple(cur_channels),
                            self.dtype, pallas_bn=self.use_pallas_bn,
                            name=f"transition{si - 1}")(xs, train)
            mode = ("module" if self.remat in (True, "module")
                    else self.remat if self.remat in ("conv",) else None)
            for m in range(stage.num_modules):
                # reference models.py:665-680: all modules multi-scale here
                mod = HighResolutionModule(
                    stage, tuple(cur_channels), ac, True, self.dtype,
                    pallas_bn=self.use_pallas_bn,
                    name=f"stage{si}_m{m}")
                if mode == "module":
                    xs = nn.remat(
                        lambda mm, inputs: mm(inputs, train)
                    )(mod, xs)
                elif mode == "conv":
                    import jax as _jax

                    xs = nn.remat(
                        lambda mm, inputs: mm(inputs, train),
                        policy=_jax.checkpoint_policies.save_only_these_names(
                            "conv_out"),
                    )(mod, xs)
                else:
                    xs = mod(xs, train)
            prev_channels = cur_channels

        # fuse to highest resolution + shared head: 1x1 conv + BN + ReLU
        # (models.py:613-617, 742-748) — see SharedHead1x1 for the two
        # mathematically identical dataflows
        import os as _os

        mode = self.head_mode
        if mode == "auto":
            mode = _os.environ.get("RHSS_HRNET_HEAD", "concat")
        hw = xs[0].shape[1:3]
        x = SharedHead1x1(
            in_ch=sum(int(b.shape[-1]) for b in xs),
            out_ch=cfg.last_channels, align_corners=ac, mode=mode,
            dtype=self.dtype, name="shared_head_conv")(xs, tuple(hw))
        return _bn_act(x, self.dtype, train, "shared_head_bn", "relu",
                       self.use_pallas_bn)
