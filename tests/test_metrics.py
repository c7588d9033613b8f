"""Metric parity tests vs a straightforward numpy oracle implementing the
torchmetrics semantics the reference relies on (performance_metrics.py:27-141,
train.py:38-81)."""
import numpy as np

from restrictive_hierarchical_semantic_segmentation_tpu.metrics.segmentation import (
    MetricAccumulator,
    level_confusion_matrices,
    metrics_from_confusion,
)


def oracle_per_class(pred, targ, num_classes, ignore=None):
    """Per-class acc(=recall)/iou/dice/precision/recall with zero-div -> 0."""
    pred, targ = pred.ravel(), targ.ravel()
    if ignore is not None:
        keep = targ != ignore
        pred, targ = pred[keep], targ[keep]
    out = {k: [] for k in ("accuracy", "iou", "dice", "precision", "recall")}
    for c in range(num_classes):
        tp = np.sum((pred == c) & (targ == c))
        fp = np.sum((pred == c) & (targ != c))
        fn = np.sum((pred != c) & (targ == c))
        sd = lambda n, d: (n / d) if d > 0 else 0.0
        out["accuracy"].append(sd(tp, tp + fn))
        out["iou"].append(sd(tp, tp + fp + fn))
        out["dice"].append(sd(2 * tp, 2 * tp + fp + fn))
        out["precision"].append(sd(tp, tp + fp))
        out["recall"].append(sd(tp, tp + fn))
    return {k: np.array(v) for k, v in out.items()}


def make_level_data(rng, B=2, H=9, W=11):
    """One-hot-ish outputs + ternary targets for the default (4,4) tree."""
    parent_t = rng.integers(0, 4, (B, H, W))
    parent_p = rng.integers(0, 4, (B, H, W))
    l0_t = np.eye(4, dtype=np.float32)[parent_t]
    l0_p = np.eye(4, dtype=np.float32)[parent_p]
    child_t = rng.integers(0, 5, (B, H, W))
    child_p = rng.integers(0, 4, (B, H, W))
    l1_t = np.zeros((B, H, W, 4), np.float32)
    for c in range(4):
        l1_t[..., c] = (child_t == c) & (parent_t == 3)
    l1_t = np.where((parent_t != 3)[..., None], -1.0, l1_t)
    l1_p = np.eye(4, dtype=np.float32)[child_p]
    return [l0_p, l1_p], [l0_t, l1_t]


def test_level0_metrics_match_oracle():
    rng = np.random.default_rng(0)
    outs, targs = make_level_data(rng)
    cms = level_confusion_matrices(outs, targs)
    got = metrics_from_confusion(np.asarray(cms[0]), child=False)
    want = oracle_per_class(
        np.argmax(outs[0], -1), np.argmax(targs[0], -1), 4
    )
    for k in got:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-12)


def test_child_level_metrics_match_oracle():
    rng = np.random.default_rng(1)
    outs, targs = make_level_data(rng)
    cms = level_confusion_matrices(outs, targs)
    got = metrics_from_confusion(np.asarray(cms[1]), child=True)

    # oracle path: -1 zeroing, bg synthesis, ignore target-bg, drop bg row
    t = targs[1].copy()
    p_oh = np.eye(4, dtype=np.float32)[np.argmax(outs[1], -1)]
    masked = t == -1.0
    p_oh = np.where(masked, 0.0, p_oh)
    t_m = np.where(masked, 0.0, t)
    p_bg = (p_oh.sum(-1, keepdims=True) == 0).astype(np.float32)
    t_bg = (t_m.sum(-1, keepdims=True) == 0).astype(np.float32)
    p_full = np.argmax(np.concatenate([p_bg, p_oh], -1), -1)
    t_full = np.argmax(np.concatenate([t_bg, t_m], -1), -1)
    want = oracle_per_class(p_full, t_full, 5, ignore=0)
    for k in got:
        np.testing.assert_allclose(got[k], want[k][1:], rtol=1e-12)


def test_accumulator_perf_no_bg():
    rng = np.random.default_rng(2)
    acc = MetricAccumulator((4, 4))
    pnbs = []
    for _ in range(3):
        outs, targs = make_level_data(rng)
        cms = [np.asarray(c) for c in level_confusion_matrices(outs, targs)]
        pnbs.append(acc.update(cms))
    mean, std = acc.selection_metric()
    np.testing.assert_allclose(mean, np.mean(pnbs), rtol=1e-12)
    np.testing.assert_allclose(std, np.std(pnbs), rtol=1e-12)
    overall = acc.epoch_overall()
    per_class = acc.epoch_per_class()
    assert len(per_class) == 8
    assert set(overall) == {"accuracy", "iou", "dice", "precision", "recall"}
    # perf_no_bg drops exactly the global background dice (train.py:53)
    dice_all = [c["dice"] for c in per_class]
    np.testing.assert_allclose(mean, np.mean(
        [np.mean([acc.per_class[c]["dice"][i] for c in range(1, 8)])
         for i in range(3)]), rtol=1e-12)


def test_perfect_prediction_scores_one():
    rng = np.random.default_rng(3)
    _, targs = make_level_data(rng)
    outs = [np.where(t == -1.0, 0.0, t) + 1e-3 for t in targs]
    # make argmax deterministic toward the true class
    cms = level_confusion_matrices(
        [t * 10.0 for t in outs], targs
    )
    m0 = metrics_from_confusion(np.asarray(cms[0]), child=False)
    present = np.asarray(cms[0]).sum(1) > 0
    np.testing.assert_allclose(m0["dice"][present], 1.0)


def test_per_image_confusion_decomposes_batch():
    """per_image=True: each image's matrix equals its own batch-1 call, and
    the per-image matrices sum to the batched matrix (the contract the
    batched offline Evaluator relies on, train/evaluate.py)."""
    rng = np.random.default_rng(4)
    outs, targs = make_level_data(rng, B=3)
    per_img = level_confusion_matrices(outs, targs, per_image=True)
    batched = level_confusion_matrices(outs, targs)
    for L, (pi, bm) in enumerate(zip(per_img, batched)):
        pi, bm = np.asarray(pi), np.asarray(bm)
        assert pi.shape[0] == 3
        np.testing.assert_array_equal(pi.sum(0), bm)
        for b in range(3):
            solo = level_confusion_matrices(
                [o[b:b + 1] for o in outs], [t[b:b + 1] for t in targs]
            )[L]
            np.testing.assert_array_equal(pi[b], np.asarray(solo))
