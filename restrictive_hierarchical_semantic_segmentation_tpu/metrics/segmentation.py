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
    "level_confusion_matrices",
    "metrics_from_confusion",
    "MetricAccumulator",
]


def classmaps_from_outputs(
    outputs_per_level: Sequence[jax.Array],
    targets_per_level: Sequence[jax.Array],
) -> List[tuple]:
    """argmax -> class maps with -1 masking and child-level background synthesis.

    outputs: per-level (B, H, W, C) scores (logits/probs/one-hots — only the
    argmax is used). targets: per-level (B, H, W, C) in {-1, 0, 1}.
    Returns per level: (pred_map, target_map, num_classes_with_bg, child).
    """
    out = []
    for L, (o, t) in enumerate(zip(outputs_per_level, targets_per_level)):
        child = L > 0
        pred_oh = jax.nn.one_hot(jnp.argmax(o, -1), o.shape[-1], dtype=jnp.float32)
        masked = t == -1.0
        pred_oh = jnp.where(masked, 0.0, pred_oh)
        t_m = jnp.where(masked, 0.0, t.astype(jnp.float32))
        if child:
            pred_bg = (jnp.sum(pred_oh, -1, keepdims=True) == 0).astype(jnp.float32)
            t_bg = (jnp.sum(t_m, -1, keepdims=True) == 0).astype(jnp.float32)
            pred_oh = jnp.concatenate([pred_bg, pred_oh], -1)
            t_m = jnp.concatenate([t_bg, t_m], -1)
        out.append(
            (jnp.argmax(pred_oh, -1), jnp.argmax(t_m, -1), pred_oh.shape[-1], child)
        )
    return out


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
    for pred, targ, c, child in classmaps_from_outputs(
        outputs_per_level, targets_per_level
    ):
        b = pred.shape[0]
        p = pred.reshape(b, -1) if per_image else pred.reshape(1, -1)
        t = targ.reshape(b, -1) if per_image else targ.reshape(1, -1)
        if child:
            valid = t != 0  # ignore_index=0 (performance_metrics.py:62)
        else:
            valid = jnp.ones_like(t, dtype=bool)
        n = p.shape[-1]
        if n < (1 << 23):
            # MXU path: one-hot contraction. Exact in fp32 while every cell
            # count stays below 2^24; HIGHEST precision keeps fp32 on TPU.
            t_oh = jax.nn.one_hot(t, c, dtype=jnp.float32)
            t_oh = t_oh * valid.astype(jnp.float32)[..., None]
            p_oh = jax.nn.one_hot(p, c, dtype=jnp.float32)
            cm = jnp.einsum(
                "bnc,bnd->bcd", t_oh, p_oh,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)
        else:
            # scatter fallback for huge pixel counts
            idx = jnp.where(valid, t * c + p, c * c)
            offs = jnp.arange(idx.shape[0])[:, None] * (c * c + 1)
            flat = jnp.zeros((idx.shape[0] * (c * c + 1),), jnp.int32)
            flat = flat.at[(idx + offs).reshape(-1)].add(1)
            cm = flat.reshape(idx.shape[0], c * c + 1)[:, : c * c].reshape(
                idx.shape[0], c, c
            )
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
