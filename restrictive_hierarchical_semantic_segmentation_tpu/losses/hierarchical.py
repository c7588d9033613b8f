"""Hierarchical restrictive losses as pure, vectorized, jit-able functions.

Replaces the reference's per-batch/per-class Python loops
(Metrics/losses.py:16-177) with masked reductions. Semantics are replicated
exactly, including the reference's NaN conventions, and verified against
torch oracles in ``tests/test_losses.py``:

* **Masked CE** (losses.py:90-134): per batch item, mean over classes of
  ``-(target * log_softmax(logits) * w)`` averaged over *valid* pixels
  (``target != -1``); if any class of an item has zero valid pixels the torch
  code produces NaN for that item, then maps it to 1.0
  (``nan_to_num(nan=1.0)``, losses.py:116); final loss = batch mean.
* **Masked soft Dice** (losses.py:16-86, smooth=0): per batch item, the
  class-weighted intersection/union are accumulated over valid pixels of the
  *probabilities* (softmax of logits); items whose union is 0 yield NaN and
  are dropped from the batch mean (losses.py:64-66); if every item drops, the
  torch code returns None and the term is skipped (train.py:141-143) — here
  that is a 0 contribution with 0 weight.
* **Consistency** (losses.py:150-177): mean over (level, parent) pairs of
  ``|sum_children P_c − P_p|`` means. Fix of reference defect #4 (SURVEY §4):
  the trainer feeds the model's *soft* probabilities (differentiable), not the
  argmaxed one-hots the shipped script passes by accident.
* **Optional KL stabiliser**: see ``ops.restrictive.grouped_conditional_kl``
  (intent of the commented losses.py:180-210; weight defaults to 0).
* **Level-staged pretraining** (train.py:125-133): levels above
  ``epoch // pretrain_epochs`` contribute no loss. Implemented with a static
  per-level weight vector computed host-side (the schedule is known per epoch)
  so the jitted step stays shape-static.

All reductions are fp32 regardless of compute dtype.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..hierarchy.tree import ClassTree
from ..ops.restrictive import grouped_conditional_kl

__all__ = [
    "masked_cross_entropy",
    "masked_soft_dice",
    "consistency_loss",
    "hierarchical_loss",
]


def masked_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    class_weight: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference CELoss with ``logits_input=True`` (losses.py:95-134).

    logits/targets: (B, H, W, C); targets in {-1, 0, 1}. Returns scalar.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = targets != -1.0
    w = (
        jnp.ones((logits.shape[-1],), jnp.float32)
        if class_weight is None
        else jnp.asarray(class_weight, jnp.float32)
    )
    # per (b, c): -(t * logp * w) averaged over that class's valid pixels
    num = -jnp.sum(jnp.where(valid, targets * logp, 0.0) * w, axis=(1, 2))
    cnt = jnp.sum(valid, axis=(1, 2)).astype(jnp.float32)  # (B, C)
    per_bc = num / jnp.maximum(cnt, 1.0)
    per_b = jnp.mean(per_bc, axis=-1)  # mean over classes (losses.py:113)
    # any empty class -> NaN in torch -> 1.0 (losses.py:116)
    has_empty = jnp.any(cnt == 0.0, axis=-1)
    per_b = jnp.where(has_empty, 1.0, per_b)
    return jnp.mean(per_b)


def masked_soft_dice(
    logits: jax.Array,
    targets: jax.Array,
    class_weight: Optional[jax.Array] = None,
    smooth: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Reference SoftDiceLoss with ``logits_input=True`` (losses.py:16-86).

    Returns ``(sum_of_item_losses, num_valid_items)`` so the caller can apply
    the reference's drop-NaN-items batch mean (losses.py:64-66) safely in jit.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    valid = (targets != -1.0).astype(jnp.float32)
    w = (
        jnp.ones((logits.shape[-1],), jnp.float32)
        if class_weight is None
        else jnp.asarray(class_weight, jnp.float32)
    )
    inter = jnp.sum(probs * targets * valid * w, axis=(1, 2, 3))  # (B,)
    union = jnp.sum((probs + targets) * valid * w, axis=(1, 2, 3))
    dice = (2.0 * inter + smooth) / (union + smooth)
    item_loss = 1.0 - dice
    ok = union > 0.0  # union==0 -> NaN in torch -> dropped
    loss_sum = jnp.sum(jnp.where(ok, item_loss, 0.0))
    return loss_sum, jnp.sum(ok.astype(jnp.float32))


def ohem_select(
    logits: jax.Array,
    targets: jax.Array,
    thres: float = 0.9,
    min_kept: int = 100000,
) -> jax.Array:
    """Online hard-example mining mask (B, H, W) — the reference ships OHEM
    only as dead yacs config keys (config/default.py:48-50 USE_OHEM/OHEMTHRES/
    OHEMKEEP, never consumed; SURVEY §2.19). Implemented here with the
    upstream HRNet-Semantic-Seg semantics, jit-static: keep valid pixels whose
    true-class probability is below ``max(kth_smallest, thres)``, guaranteeing
    at least ``min_kept`` pixels survive per image.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    t = targets.astype(jnp.float32)
    valid = jnp.any(t == 1.0, axis=-1)  # pixels with a positive class
    p_true = jnp.sum(jnp.where(t == 1.0, probs, 0.0), axis=-1)
    hw = p_true.shape[1] * p_true.shape[2]
    k = int(min(min_kept, hw))
    flat = jnp.where(valid, p_true, 2.0).reshape(p_true.shape[0], -1)
    kth = -jax.lax.top_k(-flat, k)[0][:, -1]  # kth smallest per image
    t_eff = jnp.maximum(kth, thres)[:, None, None]
    return valid & (p_true <= t_eff)


def consistency_loss(
    probs_per_level: Sequence[jax.Array],
    tree: ClassTree,
) -> jax.Array:
    """L1 parent ~= sum(children), averaged over all (level, parent) pairs
    (losses.py:150-177)."""
    from ..ops.restrictive import GROUP_UNROLL_LIMIT

    total = 0.0
    count = 0
    for L in range(1, tree.num_levels):
        p_prev = probs_per_level[L - 1].astype(jnp.float32)
        p_cur = probs_per_level[L].astype(jnp.float32)
        pidx = np.asarray(tree.parent_index[L])
        parents = tree.parents_with_children[L].tolist()
        if len(parents) > GROUP_UNROLL_LIMIT:
            # wide-tree path: ONE one-hot contraction for all parents' child
            # sums (MXU matmul — a contraction, so no (..., C_child, C_parent)
            # broadcast materializes), then a mean per parent channel
            a = jnp.asarray(
                np.asarray(tree.child_to_parent[L]), jnp.float32
            )
            child_sum = jnp.einsum("...c,cp->...p", p_cur, a,
                                   precision=jax.lax.Precision.HIGHEST)
            sel = np.asarray(parents, np.int64)
            from ..ops.restrictive import static_channel_take
            diff = jnp.abs(static_channel_take(child_sum, sel)
                           - static_channel_take(p_prev, sel))
            # mean over (batch, spatial) per parent == the reference's
            # per-parent .mean(); parents all share the same extent
            total = total + jnp.sum(jnp.mean(
                diff, axis=tuple(range(diff.ndim - 1))
            ))
            count += len(parents)
            continue
        # static per-parent member lists: slice+sum, never a
        # (..., C_child, C_parent) broadcast (HBM blowup at full res)
        from ..ops.restrictive import static_channel_take
        for p_idx in parents:
            members = [c for c in range(len(pidx)) if int(pidx[c]) == p_idx]
            child_sum = jnp.sum(static_channel_take(p_cur, members), axis=-1)
            diff = jnp.abs(child_sum - p_prev[..., p_idx])
            total = total + jnp.mean(diff)
            count += 1
    if count == 0:
        return jnp.zeros((), jnp.float32)
    return total / count


def hierarchical_loss(
    logits_per_level: Sequence[jax.Array],
    targets_per_level: Sequence[jax.Array],
    level_weights: Optional[Sequence[Sequence[float]]] = None,
    probs_per_level: Optional[Sequence[jax.Array]] = None,
    q_per_level: Optional[Sequence[Optional[jax.Array]]] = None,
    tree: Optional[ClassTree] = None,
    level_mask: Optional[Sequence[float]] = None,
    lambda_cons: float = 1.0,
    lambda_kl: float = 0.0,
    dice_smooth: float = 0.0,
    ohem: Optional[tuple] = None,
) -> tuple[jax.Array, jax.Array]:
    """Total loss = sum_L m_L * (CE_L + Dice_L) + lambda_cons * consistency
    [+ lambda_kl * KL]  (train.py:111-152 ``get_loss``; fixed per SURVEY §4
    defects #1/#4 — the lambda kwargs exist and the consistency term sees soft
    probabilities).

    ``level_mask``: static 0/1 per level for level0-pretraining (train.py:125-133).
    Returns ``(total_loss, per_level_losses)`` (per-level = CE+Dice, for the
    reference's levelLoss bookkeeping, train.py:140-143).
    """
    n_levels = len(logits_per_level)
    mask = [1.0] * n_levels if level_mask is None else list(level_mask)
    total = jnp.zeros((), jnp.float32)
    per_level = []
    for L in range(n_levels):
        w = None if level_weights is None else jnp.asarray(
            level_weights[L], jnp.float32
        )
        ce_targets = targets_per_level[L]
        if ohem is not None:
            # hard-example mining: de-selected pixels become -1 (ignored by
            # the same masking machinery as the restrictive targets)
            thres, min_kept = ohem
            keep = ohem_select(logits_per_level[L], ce_targets, thres, min_kept)
            ce_targets = jnp.where(
                keep[..., None], ce_targets.astype(jnp.float32), -1.0
            )
        ce = masked_cross_entropy(logits_per_level[L], ce_targets, w)
        dsum, dcnt = masked_soft_dice(
            logits_per_level[L], targets_per_level[L], w, dice_smooth
        )
        dice = dsum / jnp.maximum(dcnt, 1.0)  # None-skip == 0 contribution
        lvl = ce + dice
        per_level.append(lvl)
        total = total + mask[L] * lvl
    if probs_per_level is not None and tree is not None and tree.num_levels > 1:
        total = total + lambda_cons * consistency_loss(probs_per_level, tree)
    if (
        lambda_kl
        and q_per_level is not None
        and tree is not None
        and tree.num_levels > 1
    ):
        kl = jnp.zeros((), jnp.float32)
        n = 0
        for L in range(1, tree.num_levels):
            if q_per_level[L] is not None:
                kl = kl + grouped_conditional_kl(
                    q_per_level[L], tree.child_to_parent[L]
                )
                n += 1
        if n:
            total = total + lambda_kl * kl / n
    return total, jnp.stack(per_level)
