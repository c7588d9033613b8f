"""Segmentation metrics as jit-able confusion-matrix accumulators.

Replaces the reference's five torchmetrics wrapper modules — which construct a
fresh metric object per batch per class (performance_metrics.py:52-141) — with
one confusion matrix per level computed on device, from which all five metrics
(accuracy, IoU/Jaccard, Dice/F1, precision, recall) fall out on host.

Reference semantics replicated exactly (verified against torch oracles in
``tests/test_metrics.py``):

* predictions/targets are argmaxed one-hot class maps; ``-1`` target pixels
  are zeroed in both before scoring (train.py:227-231, predictEval.py:401-405);
* level 0 (``child_classes=False``): plain per-class multiclass metrics over
  ``C`` classes (performance_metrics.py:65-66);
* levels >= 1 (``child_classes=True``): a synthetic background channel
  ``sum(channels)==0`` is prepended, metrics are computed over ``C+1`` classes
  with target==background pixels ignored, and the background row is dropped
  (performance_metrics.py:33-47, 62-63);
* torchmetrics' multiclass per-class "accuracy" is per-class recall and
  zero-denominator classes score 0 (torchmetrics ``_safe_divide``);
* epoch values are means of per-batch metrics (train.py:66-70), and the model
  selection scalar ``perf_no_bg`` is the concatenated per-class Dice with the
  global background entry dropped (train.py:53).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "classmaps_from_outputs",
    "level_onehots",
    "level_confusion_matrices",
    "metrics_from_confusion",
    "MetricAccumulator",
]


def _first_max_onehot(x: jax.Array) -> jax.Array:
    """``one_hot(argmax(x, -1))`` as a fused elementwise formulation.

    ``argmax`` picks the FIRST occurrence of the maximum; so does
    ``(x == max) & (cumsum(x == max) == 1)``. On TPU this fuses into the
    surrounding elementwise work instead of lowering to an iota+reduce pass
    over the full-resolution tensor with the channel axis minor (measured
    3.2 ms per argmax at 620px b16 in results/profile_r4 — 42 GB/s — vs
    fused elementwise at HBM speed).

    The ``optimization_barrier`` is load-bearing: ``x == max(x)`` is a value
    SELF-comparison, sound only if both sides read the same bits. When ``x``
    is produced by bf16 ops (model logits), XLA may duplicate the producer
    into the two consuming fusions at different effective precisions (TPU
    bf16 ops are 'at least bf16'; e.g. the f32 upcast folds into one copy of
    the logits' resize matmul but not the other), making the equality fail on
    ~all pixels — every row becomes all-false and is scored as synthesized
    background. This collapsed the depth-4 extended-tree L0 eval metrics in
    round 4 (recall 0.018 vs 0.984 actual, BENCHMARKS round-5 note) while
    the forward was healthy. The barrier pins ONE materialized value that
    both the max-reduce and the comparison read; its HBM round-trip at
    620px is ~15 us — noise vs the 3.2 ms argmax it replaces."""
    x = jax.lax.optimization_barrier(x)
    eq = x == jnp.max(x, axis=-1, keepdims=True)
    first = jnp.cumsum(eq.astype(jnp.int32), axis=-1) == 1
    return (eq & first).astype(jnp.float32)


def level_onehots(
    outputs_per_level: Sequence[jax.Array],
    targets_per_level: Sequence[jax.Array],
) -> List[tuple]:
    """Masked one-hot class maps per level, ready for confusion contraction.

    Exactly the reference's scoring convention (train.py:217-231,
    predictEval.py:401-416) — argmax of the scores, ``-1`` target pixels
    zeroed in pred and target one-hots, child levels get a synthetic
    background channel (``sum(channels)==0``) prepended — but WITHOUT the
    one-hot -> argmax -> one-hot round-trips of the naive formulation:
    the one-hots feed the confusion einsum directly.

    Returns per level: ``(pred_oh, target_oh, valid, num_classes, child)``
    with pred_oh/target_oh (B, H, W, C') exact one-hot rows and
    ``valid`` (B, H, W) the pixels scored (child levels ignore
    target==background, performance_metrics.py:62).
    """
    out = []
    for L, (o, t) in enumerate(zip(outputs_per_level, targets_per_level)):
        child = L > 0
        masked = t == -1.0
        pred_oh = jnp.where(masked, 0.0, _first_max_onehot(o))
        t_m = jnp.where(masked, 0.0, t.astype(jnp.float32))
        # all-zero rows (fully masked pixel / no positive class) argmax to
        # class 0 in the reference; synthesize that explicitly
        pred_bg = (jnp.sum(pred_oh, -1, keepdims=True) == 0).astype(jnp.float32)
        t_bg = (jnp.sum(t_m, -1, keepdims=True) == 0).astype(jnp.float32)
        if child:
            pred_oh = jnp.concatenate([pred_bg, pred_oh], -1)
            t_aug = jnp.concatenate([t_bg, t_m], -1)
            valid = t_bg[..., 0] == 0.0  # ignore_index=0
        else:
            pred_oh = jnp.concatenate(
                [pred_oh[..., :1] + pred_bg, pred_oh[..., 1:]], -1
            )
            t_aug = jnp.concatenate([t_m[..., :1] + t_bg, t_m[..., 1:]], -1)
            valid = jnp.ones(t.shape[:-1], bool)
        # targets may be multi-hot at augmentation boundaries; the reference
        # argmax keeps the FIRST positive channel only
        t_oh = _first_max_onehot(t_aug)
        out.append((pred_oh, t_oh, valid, pred_oh.shape[-1], child))
    return out


def classmaps_from_outputs(
    outputs_per_level: Sequence[jax.Array],
    targets_per_level: Sequence[jax.Array],
) -> List[tuple]:
    """argmax -> class maps with -1 masking and child-level background synthesis.

    outputs: per-level (B, H, W, C) scores (logits/probs/one-hots — only the
    argmax is used). targets: per-level (B, H, W, C) in {-1, 0, 1}.
    Returns per level: (pred_map, target_map, num_classes_with_bg, child).
    (Index-map view over :func:`level_onehots` — used by the offline eval's
    PNG dumps; the hot train/eval steps consume the one-hots directly.)
    """
    return [
        (jnp.argmax(p_oh, -1), jnp.argmax(t_oh, -1), c, child)
        for p_oh, t_oh, _, c, child in level_onehots(
            outputs_per_level, targets_per_level
        )
    ]


def level_confusion_matrices(
    outputs_per_level: Sequence[jax.Array],
    targets_per_level: Sequence[jax.Array],
    per_image: bool = False,
) -> List[jax.Array]:
    """Per-level (C', C') int32 confusion matrices (target-row, pred-col).

    Child levels ignore target==background (index 0) pixels; their matrices
    include the background row/col (dropped at metric time). jit-able.

    ``per_image=True`` returns (B, C', C') matrices instead — one per batch
    element. The reference's epoch metrics are means of *per-batch* metrics
    (train.py:66-70) and predictEval runs batch=1, so a batched offline eval
    must score each image separately to reproduce its numbers exactly.
    """
    mats = []
    for p_oh, t_oh, valid, c, child in level_onehots(
        outputs_per_level, targets_per_level
    ):
        b = p_oh.shape[0] if per_image else 1
        # Joint-index counting on the VPU: q = t_idx*C + p_idx per pixel,
        # cm[i,j] = sum(valid & (q == i*C + j)). The earlier einsum/MXU
        # formulation needed the (n, C) one-hots transposed to C-minor,
        # which XLA lowers to a serial while+dynamic-update-slice pass per
        # level (~27 ms/step at 620px b16, results/profile_r4/ops_final);
        # the compare-and-reduce fuses with the one-hot computation and
        # runs at HBM speed. int32 accumulation is exact for any pixel
        # count, so no fp32-exactness chunking is needed.
        iota = jnp.arange(c, dtype=jnp.float32)
        p_idx = jnp.sum(p_oh * iota, -1).astype(jnp.int32)
        t_idx = jnp.sum(t_oh * iota, -1).astype(jnp.int32)
        q = (t_idx * c + p_idx).reshape(b, -1)
        w = valid.reshape(b, -1)
        cells = jnp.arange(c * c, dtype=jnp.int32)
        cm = jnp.sum(
            ((q[..., None] == cells) & w[..., None]).astype(jnp.int32),
            axis=1,
        ).reshape(-1, c, c)
        mats.append(cm if per_image else cm[0])
    return mats


def metrics_from_confusion(confmat: np.ndarray, child: bool) -> Dict[str, np.ndarray]:
    """Per-class metrics from one confusion matrix (host-side numpy)."""
    confmat = np.asarray(confmat, np.float64)
    tp = np.diag(confmat)
    support = confmat.sum(1)
    predicted = confmat.sum(0)
    fn = support - tp
    fp = predicted - tp

    def safe(n, d):
        return np.where(d > 0, n / np.maximum(d, 1), 0.0)

    m = {
        "accuracy": safe(tp, support),  # torchmetrics per-class acc == recall
        "iou": safe(tp, tp + fp + fn),
        "dice": safe(2 * tp, 2 * tp + fp + fn),
        "precision": safe(tp, tp + fp),
        "recall": safe(tp, support),
    }
    if child:  # drop synthesized background (performance_metrics.py:63)
        m = {k: v[1:] for k, v in m.items()}
    return m


class MetricAccumulator:
    """Host-side epoch aggregator with the reference's bookkeeping shape:
    per-class running lists, batch-mean epoch values, and ``perf_no_bg``."""

    KEYS = ("accuracy", "iou", "dice", "precision", "recall")

    def __init__(self, num_classes_per_level: Sequence[int]):
        self.num_classes_per_level = tuple(num_classes_per_level)
        self.total = int(sum(num_classes_per_level))
        self.per_class: List[Dict[str, List[float]]] = [
            {k: [] for k in self.KEYS} for _ in range(self.total)
        ]
        self.overall: Dict[str, List[float]] = {k: [] for k in self.KEYS}
        self.perf_no_bg: List[float] = []

    def update(self, confmats: Sequence[np.ndarray]) -> float:
        """Add one batch. Returns this batch's perf_no_bg (mean dice sans bg)."""
        per_level = [
            metrics_from_confusion(np.asarray(cm), child=L > 0)
            for L, cm in enumerate(confmats)
        ]
        cat = {
            k: np.concatenate([m[k] for m in per_level]) for k in self.KEYS
        }
        assert len(cat["dice"]) == self.total
        for k in self.KEYS:
            self.overall[k].append(float(np.mean(cat[k])))
            for c in range(self.total):
                self.per_class[c][k].append(float(cat[k][c]))
        pnb = float(np.mean(cat["dice"][1:]))  # train.py:53
        self.perf_no_bg.append(pnb)
        return pnb

    # ------------------------------------------------------------- summaries
    def epoch_overall(self) -> Dict[str, float]:
        return {k: float(np.mean(v)) if v else 0.0 for k, v in self.overall.items()}

    def epoch_per_class(self) -> List[Dict[str, float]]:
        return [
            {k: float(np.mean(v)) if v else 0.0 for k, v in c.items()}
            for c in self.per_class
        ]

    def selection_metric(self) -> tuple:
        """(mean, std) of per-batch perf_no_bg — the best-checkpoint criterion
        (train.py:345, 664)."""
        if not self.perf_no_bg:
            return 0.0, 0.0
        return float(np.mean(self.perf_no_bg)), float(np.std(self.perf_no_bg))
