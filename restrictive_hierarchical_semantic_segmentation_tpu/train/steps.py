"""The pjit'ed hot path: one fused train step (fwd + loss + bwd + AdamW update
+ metric confusion matrices) and the matching eval step.

Reference hot loop (train.py:161-279) dispatches, per batch: a D-pass model
forward, per-level softmax/argmax/one-hot, Python-loop losses, five fresh
torchmetrics modules per level, backward, and the optimizer — each as separate
eager ops. Here the entire step is ONE compiled XLA program per (shape, mode):
everything fuses, the metric confusion matrices ride along as tiny int32
reductions, and under a sharded mesh the gradient/batch-norm reductions become
ICI collectives inserted by the compiler.

Static configuration (model, tree, weights, lambdas) is closed over in a step
factory; the level-pretraining mask (train.py:125-133) is a tiny dynamic
float vector so epoch changes don't recompile.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax

from ..hierarchy.tree import ClassTree
from ..losses.hierarchical import hierarchical_loss
from ..metrics.segmentation import level_confusion_matrices
from .state import TrainState

__all__ = ["make_train_step", "make_eval_step", "split_targets"]


def split_targets(tree: ClassTree, targets: jax.Array, hierarchical: bool):
    """(B, H, W, C_total) -> per-level list (train.py:185-193)."""
    if not hierarchical:
        return [targets]
    return tree.split_levels(targets, axis=-1)


def _metric_outputs(out, hierarchical: bool):
    """Scores whose argmax defines the predicted class per level.

    The reference argmaxes softmax(logits) per level in BOTH the train monitor
    (train.py:217-224) and predictEval (predictEval.py:409-416) — the composed
    probabilities are never the scored prediction. For single-group levels
    (the default tree) the two argmaxes coincide; we follow the reference
    (logits) for published-number parity."""
    return list(out.logits_per_level)


def make_train_step(
    model,
    tx,
    tree: ClassTree,
    hierarchical: bool,
    level_weights: Optional[Sequence[Sequence[float]]] = None,
    lambda_cons: float = 1.0,
    lambda_kl: float = 0.0,
    dice_smooth: float = 0.0,
    ohem=None,
    compute_metrics: bool = True,
    donate: bool = True,
) -> Callable:
    """Returns jitted ``step(state, images, targets, level_mask) ->
    (state, aux)`` with aux = {loss, per_level, confmats}."""

    def loss_fn(params, batch_stats, images, targets, level_mask):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        tgt = split_targets(tree, targets, hierarchical)
        total, per_level = hierarchical_loss(
            out.logits_per_level,
            tgt,
            level_weights,
            probs_per_level=out.probs_per_level,
            q_per_level=out.q_per_level,
            tree=tree if hierarchical else None,
            level_mask=level_mask,
            lambda_cons=lambda_cons,
            lambda_kl=lambda_kl,
            dice_smooth=dice_smooth,
            ohem=ohem,
        )
        return total, (updates["batch_stats"], per_level, out)

    def step(state: TrainState, images, targets, level_mask):
        (loss, (new_stats, per_level, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, images, targets, level_mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        new_state = state.replace(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        aux = {"loss": loss, "per_level": per_level}
        if compute_metrics:
            tgt = split_targets(tree, targets, hierarchical)
            aux["confmats"] = level_confusion_matrices(
                _metric_outputs(out, hierarchical), tgt
            )
        return new_state, aux

    donate_args = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_args)


def make_eval_step(
    model,
    tree: ClassTree,
    hierarchical: bool,
    level_weights: Optional[Sequence[Sequence[float]]] = None,
    lambda_cons: float = 1.0,
    lambda_kl: float = 0.0,
    dice_smooth: float = 0.0,
    ohem=None,
    return_outputs: bool = False,
) -> Callable:
    """Jitted ``eval_step(params, batch_stats, images, targets) ->
    {loss, per_level, confmats[, outputs]}`` (reference ``test``,
    train.py:283-393 / predictEval.py:265-573). Uses running BN statistics."""

    def step(params, batch_stats, images, targets):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        tgt = split_targets(tree, targets, hierarchical)
        total, per_level = hierarchical_loss(
            out.logits_per_level,
            tgt,
            level_weights,
            probs_per_level=out.probs_per_level,
            q_per_level=out.q_per_level,
            tree=tree if hierarchical else None,
            lambda_cons=lambda_cons,
            lambda_kl=lambda_kl,
            dice_smooth=dice_smooth,
            ohem=ohem,
        )
        scores = _metric_outputs(out, hierarchical)
        res = {
            "loss": total,
            "per_level": per_level,
            "confmats": level_confusion_matrices(scores, tgt),
        }
        if return_outputs:
            res["outputs"] = scores
        return res

    return jax.jit(step)
