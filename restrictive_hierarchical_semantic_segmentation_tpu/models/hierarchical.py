"""Hierarchical restrictive segmenter — the framework's flagship model wrapper.

Generic over donor backbones (UNet / HRNet), re-designing the reference's two
copy-pasted wrappers (UNet: models.py:192-306; HRNet: models.py:554-802) as one
module:

* **flat mode** (``model_type==0``): one head over all leaf classes.
* **hierarchical mode** (``model_type==1``): per-level heads; the backbone is
  re-run once per tree depth ("recurrent level-wise prediction"), each re-run
  FiLM-conditioned on the previous level's probabilities; level 0 parents are
  sigmoid-activated; deeper levels use the gated grouped softmax and
  probabilistic composition ``P_c = P_p * Q_{c|p}``.

The level loop is unrolled at trace time (depth <= 4 in practice): the
backbone *parameters are shared* across levels (one Flax submodule), exactly
matching the reference's weight sharing, while each level owns its head and
FiLM parameters.

**Explicit backbone sharing (share_backbone=True, the default).** Because
FiLM conditions *after* the backbone (reference models.py:277/:773-774:
``dL = self._run_unet(x)`` on the *unchanged* input), every re-run of the
backbone within one step sees identical inputs and identical weights, so the
D passes are mathematically ONE pass:

* train-mode forward: BatchNorm normalizes with *batch* statistics, which
  depend only on (input, weights) — identical across re-runs, so features
  (and therefore all level outputs) are bit-equal to the naive D-pass form;
* gradients: each level's loss backprops into the same shared weights; by
  linearity the sum over levels through one shared pass equals the sum over
  D independent passes;
* the ONLY observable difference is that the reference applies the BN
  running-stat EMA D times per step (same batch value each time). The train
  step preserves that exactly with a closed-form post-hoc correction
  (``bn_updates_per_step`` in train/steps.py): D EMA updates with momentum m
  and a fixed batch value equal one update with momentum ``m**D``.

Round-1 relied on XLA CSE to merge the D passes; that merge was total on CPU
but only partial on TPU (hier/flat step ratio 1.56x). Explicit sharing makes
the hierarchical step cost ~= flat + D tiny heads/FiLMs by construction.
``share_backbone=False`` restores the naive re-run form (used by the
equivalence test); ``concat_prev_probs=True`` (whose re-runs truly differ)
always pays D passes.

Config extension (SURVEY.md "critical reading note"): the README abstract
describes concatenating previous-level logits to the input image; the
reference *code* conditions only through FiLM. ``concat_prev_probs=True``
enables the abstract's variant: previous-level probabilities are resized to
the input and concatenated (zero-filled at level 0 and right-padded to a
static width so every re-run shares one backbone signature).
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..hierarchy.tree import ClassTree
from ..ops.resize import resize_bilinear
from ..ops.restrictive import gated_grouped_softmax
from .film import FiLM

__all__ = ["HierarchicalSegmenter", "SegmenterOutput"]


class SegmenterOutput(NamedTuple):
    """Model outputs (a NamedTuple so JAX flattens it as a pytree).

    flat mode: ``probs_per_level is None`` and ``logits_per_level == [logits]``
    (reference returns ``[], logits`` — models.py:261/:758).
    ``q_per_level`` holds the conditionals ``Q_{c|p}`` (None at level 0) for
    the optional KL stabiliser.
    """

    probs_per_level: Optional[List]
    logits_per_level: List
    q_per_level: Optional[List]


class HierarchicalSegmenter(nn.Module):
    tree: ClassTree
    backbone: nn.Module
    hierarchical: bool = True
    final_conv_kernel: int = 1       # HRNet FINAL_CONV_KERNEL (yaml:18)
    align_corners: bool = True       # for logit upsampling (HRNet path)
    concat_prev_probs: bool = False  # README-abstract variant (off = code parity)
    remat: object = False            # False | "module"/True | "conv" (see _run_backbone)
    share_backbone: bool = True      # one explicit pass for all levels (exact)
    dtype: jnp.dtype = jnp.float32

    @property
    def bn_updates_per_step(self) -> int:
        """How many BN running-stat EMA updates per optimizer step the
        *reference* performs vs how many this module's forward performs.

        The reference re-runs the backbone once per level (D updates); with
        ``share_backbone`` the forward performs one. The train step multiplies
        the EMA by this factor (closed form) to keep running stats identical."""
        if self.hierarchical and self.share_backbone and not self.concat_prev_probs:
            return self.tree.num_levels
        return 1

    def _run_backbone(self, x, train: bool):
        """One donor pass; ``remat`` trades FLOPs for HBM (large-batch
        scaling): True/"module" = full recompute in backward, "conv" = save
        conv outputs and recompute only the elementwise BN/relu tails."""
        if not self.remat:
            return self.backbone(x, train=train)
        if self.remat == "conv":
            import jax

            return nn.remat(
                lambda m, xx: m(xx, train=train),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"),
            )(self.backbone, x)
        return nn.remat(lambda m, xx: m(xx, train=train))(self.backbone, x)

    def _head(self, feats, out_ch: int, name: str):
        pad = 1 if self.final_conv_kernel == 3 else 0
        k = self.final_conv_kernel
        return nn.Conv(out_ch, (k, k), padding=pad, use_bias=True,
                       dtype=self.dtype, name=name)(feats)

    def _maybe_upsample(self, z, hw):
        if z.shape[1:3] != hw:
            z = resize_bilinear(z, tuple(hw), self.align_corners)
        return z

    def _backbone_input(self, x, prev_probs: Optional[jnp.ndarray]):
        if not self.concat_prev_probs:
            return x
        width = max(self.tree.classes_per_level)
        if prev_probs is None:
            extra = jnp.zeros(x.shape[:3] + (width,), x.dtype)
        else:
            extra = resize_bilinear(
                prev_probs, tuple(x.shape[1:3]), self.align_corners
            ).astype(x.dtype)
            pad = width - extra.shape[-1]
            if pad:
                extra = jnp.pad(extra, ((0, 0),) * 3 + ((0, pad),))
        return jnp.concatenate([x, extra], axis=-1)

    @nn.compact
    def __call__(self, x, train: bool = False) -> SegmenterOutput:
        hw = x.shape[1:3]
        t = self.tree

        if not self.hierarchical:
            feats = self._run_backbone(self._backbone_input(x, None), train)
            z = self._head(feats, t.num_leaves, "head_flat")
            z = self._maybe_upsample(z, hw)
            return SegmenterOutput(None, [z.astype(jnp.float32)], None)

        probs: List[jnp.ndarray] = []
        logits: List[jnp.ndarray] = []
        qs: List[Optional[jnp.ndarray]] = []

        # Level 0: independent parent probabilities via sigmoid
        # (models.py:267-271 / :763-769)
        feats = self._run_backbone(self._backbone_input(x, None), train)
        z0 = self._maybe_upsample(
            self._head(feats, t.classes_per_level[0], "head_l0"), hw
        ).astype(jnp.float32)
        probs.append(nn.sigmoid(z0))
        logits.append(z0)
        qs.append(None)

        # Levels >= 1: recurrent level-wise prediction + FiLM + restrictive
        # head (models.py:275-305 / :772-798). With share_backbone the D
        # re-runs collapse to the single level-0 pass (see module docstring:
        # exact — FiLM conditions after the backbone, inputs are unchanged).
        share = self.share_backbone and not self.concat_prev_probs
        for L in range(1, t.num_levels):
            if share:
                feats_l = feats
            else:
                feats_l = self._run_backbone(
                    self._backbone_input(x, probs[L - 1]), train
                )
            feats_l = FiLM(dtype=self.dtype, name=f"film_l{L}")(
                feats_l, probs[L - 1].astype(self.dtype)
            )
            zL = self._maybe_upsample(
                self._head(feats_l, t.classes_per_level[L], f"head_l{L}"), hw
            ).astype(jnp.float32)
            q, p_child = gated_grouped_softmax(
                zL, probs[L - 1], t.parent_index[L], t.child_to_parent[L]
            )
            probs.append(p_child)
            logits.append(zL)
            qs.append(q)

        return SegmenterOutput(probs, logits, qs)


def build_model(
    tree: ClassTree,
    model_select: int = 0,
    model_type: int = 1,
    hrnet_config=None,
    dtype=jnp.float32,
    concat_prev_probs: bool = False,
    remat: bool = False,
    use_pallas_bn: bool = False,
    share_backbone: bool = True,
) -> HierarchicalSegmenter:
    """Factory matching the reference CLI conventions (train.py:456-462):
    ``model_select`` 0 = UNet, 1 = HRNet; ``model_type`` 0 = flat, 1 = hier."""
    from .backbones.hrnet import HRNetBackbone
    from .backbones.unet import UNetBackbone

    seg_remat = remat
    if model_select == 0:
        backbone = UNetBackbone(dtype=dtype)
        final_k, ac = 1, True
    else:
        from ..config.hrnet import hrnet_w48

        cfg = hrnet_config or hrnet_w48()
        # HRNet remats per HighResolutionModule (whole-backbone remat regions
        # overwhelm this environment's remote TPU compiler at 620px)
        backbone = HRNetBackbone(config=cfg, dtype=dtype, remat=remat,
                                 use_pallas_bn=use_pallas_bn)
        seg_remat = False
        final_k, ac = cfg.final_conv_kernel, cfg.align_corners
    return HierarchicalSegmenter(
        tree=tree,
        backbone=backbone,
        hierarchical=model_type == 1,
        final_conv_kernel=final_k,
        align_corners=ac,
        concat_prev_probs=concat_prev_probs,
        remat=seg_remat,
        share_backbone=share_backbone,
        dtype=dtype,
    )
