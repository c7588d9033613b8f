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
import jax.numpy as jnp

from ..hierarchy.tree import ClassTree
from ..losses.hierarchical import hierarchical_loss
from ..metrics.segmentation import level_confusion_matrices
from .state import TrainState

__all__ = ["make_train_step", "make_eval_step", "split_targets",
           "bn_ema_correction"]


def bn_ema_correction(old_stats, one_update_stats, momentum: float, d: int):
    """Exact closed form for "apply the BN running-stat EMA ``d`` times with
    the same batch value" given ONE applied update.

    The reference re-runs the backbone once per tree level (models.py:277/:773)
    so each BN layer EMA-updates its running stats D times per optimizer step —
    with the *same* batch statistics each time (same input, same weights).
    With the shared-backbone forward the model applies the update once:
    ``n1 = m*ra + (1-m)*v``. D sequential updates give
    ``nD = m^D*ra + (1-m^D)*v``; substituting ``v = (n1 - m*ra)/(1-m)``:

        nD = ra*(m^D - m*k) + n1*k,   k = (1-m^D)/(1-m)

    Elementwise over the (tiny, per-channel) batch_stats pytree."""
    if d <= 1:
        return one_update_stats
    m = momentum
    k = (1.0 - m**d) / (1.0 - m)
    c_old = m**d - m * k
    return jax.tree_util.tree_map(
        lambda ra, n1: (ra * c_old + n1 * k).astype(n1.dtype),
        old_stats, one_update_stats,
    )


def split_targets(tree: ClassTree, targets: jax.Array, hierarchical: bool):
    """(B, H, W, C_total) -> per-level list (train.py:185-193)."""
    if not hierarchical:
        return [targets]
    return tree.split_levels(targets, axis=-1)


def _device_decode(images: jax.Array, targets: jax.Array):
    """Device-side completion of the compact host formats (data/dataset.py):
    int8 ternary targets upcast to f32, single-channel grayscale images
    broadcast to the reference's 3-channel layout. Both fuse into the first
    consumers — the host ships 4x/3x fewer bytes through the interconnect."""
    import jax.numpy as jnp

    if targets.dtype != jnp.float32:
        targets = targets.astype(jnp.float32)
    if images.shape[-1] == 1:
        images = jnp.broadcast_to(
            images, images.shape[:-1] + (3,)
        )
    return images, targets


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
    jit: bool = True,
    grad_accum: int = 1,
    out_shardings=None,
) -> Callable:
    """Returns jitted ``step(state, images, targets, level_mask) ->
    (state, aux)`` with aux = {loss, per_level, confmats}.

    BN running-stat semantics: the reference updates every BN's EMA once per
    backbone re-run (D times per step for a depth-D tree). The shared-backbone
    forward applies it once; ``bn_ema_correction`` restores the exact D-times
    value (model.bn_updates_per_step, models/hierarchical.py)."""
    from ..models.norm import BN_MOMENTUM as bn_momentum

    bn_d = int(getattr(model, "bn_updates_per_step", 1))

    def loss_fn(params, batch_stats, images, targets, level_mask):
        images, targets = _device_decode(images, targets)
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            train=True,
            mutable=["batch_stats"],
        )
        updates = {"batch_stats": bn_ema_correction(
            batch_stats, updates["batch_stats"], bn_momentum, bn_d
        )}
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

    def _micro_grads(params, batch_stats, images, targets, level_mask):
        (loss, (new_stats, per_level, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, images, targets, level_mask)
        confmats = None
        if compute_metrics:
            _, targets_f32 = _device_decode(images, targets)
            tgt = split_targets(tree, targets_f32, hierarchical)
            confmats = level_confusion_matrices(
                _metric_outputs(out, hierarchical), tgt
            )
        return grads, new_stats, loss, per_level, confmats

    def _apply_updates(state, grads, new_stats):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates
        )
        return state.replace(
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )

    def step(state: TrainState, images, targets, level_mask):
        grads, new_stats, loss, per_level, confmats = _micro_grads(
            state.params, state.batch_stats, images, targets, level_mask
        )
        aux = {"loss": loss, "per_level": per_level}
        if confmats is not None:
            aux["confmats"] = confmats
        return _apply_updates(state, grads, new_stats), aux

    def accum_step(state: TrainState, images, targets, level_mask):
        """ONE optimizer step from ``grad_accum`` sequential microbatches
        (lax.scan): gradients are the microbatch mean, BatchNorm batch
        statistics and running-stat EMAs follow microbatch-sequential
        semantics (each microbatch normalizes with its own statistics, as a
        smaller-batch training run would), metric confusion matrices sum.
        The standard grad-accumulation delta vs one big batch: per-microbatch
        masked-loss denominators and BN statistics differ slightly.
        Peak activation memory is that of ONE microbatch — a cheaper
        large-batch knob than rematerialization (BENCHMARKS.md)."""
        A = grad_accum
        B = images.shape[0]
        if B % A != 0:
            raise ValueError(f"batch {B} not divisible by grad_accum {A}")
        im = images.reshape((A, B // A) + images.shape[1:])
        tg = targets.reshape((A, B // A) + targets.shape[1:])
        gzero = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )

        def body(carry, xy):
            bstats, gsum = carry
            x_mb, y_mb = xy
            grads, bstats, loss, per_level, confmats = _micro_grads(
                state.params, bstats, x_mb, y_mb, level_mask
            )
            gsum = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), gsum, grads
            )
            ys = (loss, per_level) + (
                (tuple(confmats),) if confmats is not None else ()
            )
            return (bstats, gsum), ys

        (new_stats, gsum), ys = jax.lax.scan(
            body, (state.batch_stats, gzero), (im, tg)
        )
        grads = jax.tree_util.tree_map(lambda g: g / A, gsum)
        aux = {"loss": ys[0].mean(), "per_level": ys[1].mean(axis=0)}
        if compute_metrics:
            aux["confmats"] = [c.sum(axis=0) for c in ys[2]]
        return _apply_updates(state, grads, new_stats), aux

    if grad_accum > 1:
        step = accum_step

    if not jit:
        # raw step for composition under transforms (fold_parallel vmaps it
        # over a stacked fold axis before jitting)
        return step
    donate_args = (0,) if donate else ()
    # out_shardings: multi-process runs pin every output replicated so the
    # host-side fetches (checkpoint snapshot, epoch aux) read local shards
    # instead of initiating a cross-process transfer only one process joins
    return jax.jit(step, donate_argnums=donate_args,
                   out_shardings=out_shardings)


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
    per_image_metrics: bool = False,
    apply_fn: Optional[Callable] = None,
    out_shardings=None,
) -> Callable:
    """Jitted ``eval_step(params, batch_stats, images, targets) ->
    {loss, per_level, confmats[, outputs]}`` (reference ``test``,
    train.py:283-393 / predictEval.py:265-573). Uses running BN statistics.

    ``per_image_metrics=True`` makes confmats (B, C', C') — required by the
    batched offline Evaluator to reproduce the reference's per-image scoring
    (predictEval batch=1) while running the forward at batch > 1.

    ``apply_fn``: optional replacement for ``model.apply`` with the same
    signature (e.g. the int8-quantized wrapper from ``train/quantize.py``)."""
    _apply = apply_fn or model.apply

    def step(params, batch_stats, images, targets):
        images, targets = _device_decode(images, targets)
        out = _apply(
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
            "confmats": level_confusion_matrices(
                scores, tgt, per_image=per_image_metrics
            ),
        }
        if return_outputs:
            res["outputs"] = scores
        return res

    return jax.jit(step, out_shardings=out_shardings)
