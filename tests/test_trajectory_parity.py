"""TRAINING-TRAJECTORY parity vs the reference trainer (torch as the oracle,
imported read-only from /root/reference — skipped when absent).

test_grad_parity pins ONE optimization step; this pins the *training run*
(VERDICT r2 "Next round" #1): identical init + identical pre-augmented
batches through both frameworks' full epoch machinery for several epochs of
the tiny hier-UNet and hier-HRNet must agree on

* the per-epoch mean training-loss curve,
* the per-epoch validation selection metric (mean per-batch dice-no-bg,
  train.py:53,345) and last-batch val loss (the metrics.csv convention,
  train.py:341),
* every ReduceLROnPlateau(max, 0.5, patience=3) LR decision (train.py:603-611),
* and the best-checkpoint epoch (strictly-greater gate, train.py:664),

with the JAX side running the real ``Trainer`` (loaders swapped for fixed
batches) so ``metrics.csv``, the jsonl logs, and the orbax ``best.ckpt`` are
the artifacts compared — not a test-local re-implementation.

The torch side is a test-local mini-trainer implementing the reference's
*intent* (its shipped ``train()`` crashes on the first batch, SURVEY §4
defect #1): per batch forward -> CE+Dice+soft-consistency -> AdamW step
(train.py:161-279 with defect #4 fixed, exactly as test_grad_parity), then
eval-mode validation with the per-batch metric conventions, ReduceLROnPlateau
stepping on val dice-no-bg, strict-> best tracking.

fp-divergence notes. Two fp32 implementations of the same math drift apart
over optimizer steps (different reduction orders), so curve tolerances widen
with epoch count while the LR/best-ckpt *decisions* must match exactly.
Decision agreement is only meaningful when no decision sat on a knife edge
(a metric within fp-drift of the plateau threshold or a near-tied best), so
the test ALSO asserts every decision's margin exceeds the measured
cross-framework metric delta — if a future jax/torch version moves the
numbers onto a knife edge, the margin assertion fails with a clear message
(re-seed the data) instead of the decisions flaking. The plateau *decay
arithmetic* itself is pinned exhaustively against torch in
test_train_steps.py::test_plateau_matches_torch.
"""
import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

LW = [[0.0297, 1.577, 0.9619, 0.1770], [1.5432, 0.2638, 1.0413, 3.9722]]
B = 2           # train batch
VB = 2          # val batch
MIN_LR = 1e-6
PLATEAU_THRESHOLD = 1e-4  # torch ReduceLROnPlateau default (rel mode)


@pytest.fixture(scope="module")
def ref_models():
    sys.path.insert(0, REF)
    import types

    for name in ("timm", "timm.models", "timm.models.vision_transformer"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["timm.models.vision_transformer"]._cfg = lambda *a, **k: {}
    sys.modules["timm"].models = sys.modules["timm.models"]
    sys.modules["timm.models"].vision_transformer = sys.modules[
        "timm.models.vision_transformer"]
    from Models import models as ref_models  # noqa: E402

    return ref_models


# --------------------------------------------------------------- fixed data
class FixedLoader:
    """Loader facade over precomputed batches — both frameworks consume the
    exact same arrays in the exact same order every epoch."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)

    def set_epoch(self, epoch):
        pass

    def close(self):
        pass


def build_fixed_batches(tree, root, batch, size, limit=None, hierarchical=True):
    """Deterministic (augment=False) target-factory batches from a split dir."""
    from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import (
        SegDataset,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        list_pairs,
    )

    imgs, labs = list_pairs(root)
    ds = SegDataset(imgs, labs, tree, size, hierarchical=hierarchical,
                    augment=False)
    items = [ds[i] for i in range(len(imgs))]
    out = []
    for i in range(0, len(items) - batch + 1, batch):
        chunk = items[i:i + batch]
        out.append((np.stack([c[0] for c in chunk]),
                    np.stack([c[1] for c in chunk])))
    return out[:limit] if limit else out


# ------------------------------------------------- torch-side mini-trainer
def _split_levels_nchw(y, tree):
    """(B,H,W,Ctot) {-1,0,1} -> per-level NCHW torch tensors."""
    import torch

    outs, off = [], 0
    for c in tree.classes_per_level:
        outs.append(torch.from_numpy(
            np.ascontiguousarray(y[..., off:off + c].transpose(0, 3, 1, 2))))
        off += c
    return outs


def _np_perf_no_bg(probs_nhwc, targets_nhwc):
    """Independent numpy re-implementation of the selection metric: per-level
    argmax -> one-hot, -1 masking, child-level background synthesis with
    ignore_index=0, per-class dice over the WHOLE batch, concatenated, global
    background entry dropped, mean (train.py:53 / performance_metrics.py)."""
    dices = []
    for L, (p, t) in enumerate(zip(probs_nhwc, targets_nhwc)):
        child = L > 0
        c = p.shape[-1]
        pred = np.eye(c, dtype=np.float32)[np.argmax(p, -1)]
        masked = t == -1.0
        pred = np.where(masked, 0.0, pred)
        tm = np.where(masked, 0.0, t.astype(np.float32))
        if child:
            pred = np.concatenate(
                [(pred.sum(-1, keepdims=True) == 0).astype(np.float32), pred],
                -1)
            tm = np.concatenate(
                [(tm.sum(-1, keepdims=True) == 0).astype(np.float32), tm], -1)
            c += 1
        pm, tmap = np.argmax(pred, -1).ravel(), np.argmax(tm, -1).ravel()
        valid = tmap != 0 if child else np.ones_like(tmap, bool)
        cm = np.zeros((c, c), np.int64)
        np.add.at(cm, (tmap[valid], pm[valid]), 1)
        tp = np.diag(cm).astype(np.float64)
        fn = cm.sum(1) - tp
        fp = cm.sum(0) - tp
        denom = 2 * tp + fp + fn
        dice = np.where(denom > 0, 2 * tp / np.maximum(denom, 1), 0.0)
        dices.append(dice[1:] if child else dice)
    cat = np.concatenate(dices)
    return float(np.mean(cat[1:]))


def _torch_flat_loss(logits, target, w):
    """Reference loss assembly for model_type=0 (train.py:111-152 at one
    level, the consistency term gated off by ``hasattr(model, 'levels')``):
    per-batch-item per-class masked CE (losses.py:90-134) + soft Dice
    (losses.py:16-86, smooth=0). Flat targets are plain one-hot (the ternary
    encoding is hierarchical-only, dataset.py:461-464) so the -1 masks are
    trivially all-true, but the loop semantics are kept identical."""
    import torch
    import torch.nn.functional as F

    w = torch.tensor(w)
    logp = F.log_softmax(logits, 1)
    items = []
    for b in range(logits.shape[0]):
        loss = 0.0
        for c in range(logits.shape[1]):
            m = target[b, c] != -1
            loss = loss + (-(target[b, c][m] * logp[b, c][m] * w[c]).mean())
        items.append(loss / logits.shape[1])
    total = torch.stack(
        [torch.nan_to_num(l, nan=1.0) for l in items]).mean()
    probs = F.softmax(logits, 1)
    vals = []
    for b in range(logits.shape[0]):
        mask = target[b] != -1
        inter, union = 0.0, 0.0
        for c in range(logits.shape[1]):
            ic, tc = probs[b, c][mask[c]], target[b, c][mask[c]]
            inter = inter + (ic * tc * w[c]).sum()
            union = union + (ic * w[c]).sum() + (tc * w[c]).sum()
        vals.append(1.0 - 2 * inter / union)
    vals = [v for v in vals if not torch.isnan(v)]
    return total + torch.stack(vals).mean()


def run_torch_trajectory(tmodel, tree, train_batches, val_batches, forward,
                         lr, epochs, lw=None, flat=False):
    """Reference-intent train() loop: returns per-epoch history + best epoch."""
    import torch

    from test_grad_parity import _torch_loss

    if lw is None:
        lw = LW
    opt = torch.optim.AdamW(tmodel.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=3, min_lr=MIN_LR)
    hist = {"train_loss": [], "val_measure": [], "val_loss": [], "lr": []}
    best_measure, best_epoch = None, None
    for epoch in range(1, epochs + 1):
        hist["lr"].append(opt.param_groups[0]["lr"])
        tmodel.train()
        losses = []
        for x, y in train_batches:
            xt = torch.from_numpy(
                np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
            if flat:
                targets = [torch.from_numpy(
                    np.ascontiguousarray(y.transpose(0, 3, 1, 2)))]
                _, z = forward(xt)
                logits = [z]
                loss = _torch_flat_loss(z, targets[0], lw[0])
            else:
                targets = _split_levels_nchw(y, tree)
                probs, logits = forward(xt)
                loss = _torch_loss(probs, logits, targets, tree, lw=lw)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        hist["train_loss"].append(float(np.mean(losses)))

        tmodel.eval()
        measures, vloss = [], 0.0
        with torch.no_grad():
            for x, y in val_batches:
                xt = torch.from_numpy(
                    np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
                if flat:
                    targets = [torch.from_numpy(
                        np.ascontiguousarray(y.transpose(0, 3, 1, 2)))]
                    _, z = forward(xt)
                    logits = [z]
                    vloss = float(_torch_flat_loss(z, targets[0], lw[0]))
                else:
                    targets = _split_levels_nchw(y, tree)
                    probs, logits = forward(xt)
                    vloss = float(
                        _torch_loss(probs, logits, targets, tree, lw=lw))
                # the reference scores argmax(softmax(LOGITS)) per level
                # (train.py:217-224), NOT the composed probabilities. For
                # single-group levels (default tree) the two argmaxes coincide
                # (the log(P_p) gate and the P_p factor are constant across a
                # group's channels per pixel); for multi-parent levels
                # (extended tree) they genuinely differ.
                measures.append(_np_perf_no_bg(
                    [z.permute(0, 2, 3, 1).numpy() for z in logits],
                    [t.permute(0, 2, 3, 1).numpy() for t in targets]))
        val_measure = float(np.mean(measures))
        hist["val_measure"].append(val_measure)
        hist["val_loss"].append(vloss)  # last batch (train.py:341)
        sched.step(val_measure)
        if best_measure is None or val_measure > best_measure:  # train.py:664
            best_measure, best_epoch = val_measure, epoch
    return hist, best_epoch


# ------------------------------------------------------- jax-side trainer
def run_jax_trainer(cfg_kwargs, tree, train_batches, val_batches, save_loc):
    """The REAL Trainer with fixed-batch loaders; returns the trajectory read
    back from its artifacts (metrics.csv, jsonl logs, best.ckpt meta) plus
    the INITIAL params/batch_stats for seeding the torch side."""
    from restrictive_hierarchical_semantic_segmentation_tpu.config.run import (
        RunConfig,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.loop import (
        Trainer,
    )

    cfg = RunConfig(**cfg_kwargs)
    tr = Trainer(cfg, tree, cfg_kwargs["data_root"], None, save_loc)
    tr.train_loader.close()
    tr.val_loader.close()
    tr.train_loader = FixedLoader(train_batches)
    tr.val_loader = FixedLoader(val_batches)
    # snapshot BEFORE running: the jitted step donates the state buffers
    import jax

    init_params = jax.tree_util.tree_map(np.array, tr.state.params)
    init_stats = jax.tree_util.tree_map(np.array, tr.state.batch_stats)
    try:
        tr.run()
    finally:
        tr.close()

    # ---- trajectory from the artifacts the user would read ----------------
    import csv

    epochs = cfg_kwargs["epochs"]
    with open(os.path.join(save_loc, "metrics.csv"), newline="") as f:
        rows = list(csv.reader(f))
    assert rows[0][0] == "Epoch" and len(rows) == epochs + 1
    hist = {
        "train_loss": [float(r[1]) for r in rows[1:]],
        "val_loss": [float(r[9]) for r in rows[1:]],
        "val_measure": [float(r[16]) for r in rows[1:]],
    }
    with open(os.path.join(save_loc, "logs", "metrics.jsonl")) as f:
        logs = [json.loads(ln) for ln in f if ln.strip()]
    hist["lr"] = [d["train/lr"] for d in logs if "train/lr" in d]
    meta = json.load(
        open(os.path.join(save_loc, "best.ckpt", "rhss_meta.json")))
    return hist, (init_params, init_stats), int(meta["epoch"])


def _assert_decisions_not_knife_edge(t_vals, delta):
    """Every plateau is-better decision (torch semantics: metric >
    best*(1+1e-4), rel mode) and the best-epoch choice must clear their
    thresholds by MORE than the cross-framework metric drift that could have
    flipped them: at epoch e the comparison is val[e] vs best-so-far's
    threshold, so the relevant drift is delta[e] + delta[best-so-far]."""
    best, best_i = None, None
    for e, v in enumerate(t_vals):
        if best is not None:
            thr = best * (1.0 + PLATEAU_THRESHOLD)
            margin = abs(v - thr)
            drift = delta[e] + delta[best_i]
            assert margin > drift, (
                f"plateau decision at epoch {e + 1} sat on a knife edge "
                f"(margin {margin:.4g} <= possible drift {drift:.4g}); "
                f"re-seed the synthetic data so the comparison is meaningful")
        if best is None or v > best:
            best, best_i = v, e
    # best-epoch uniqueness: the top value's gap over the runner-up
    order = np.argsort(t_vals)[::-1]
    if len(order) > 1:
        i, j = int(order[0]), int(order[1])
        gap = t_vals[i] - t_vals[j]
        assert gap > delta[i] + delta[j], (
            f"best-epoch choice sat on a knife edge (gap {gap:.4g} <= "
            f"possible drift {delta[i] + delta[j]:.4g}); re-seed")


def assert_trajectories_match(f_hist, t_hist, f_best, t_best, epochs):
    assert len(f_hist["lr"]) == epochs
    # loss curves: fp reduction-order drift compounds over optimizer steps
    np.testing.assert_allclose(
        f_hist["train_loss"][0], t_hist["train_loss"][0], rtol=2e-3,
        err_msg="epoch-1 train loss")
    np.testing.assert_allclose(
        f_hist["train_loss"], t_hist["train_loss"], rtol=6e-2,
        err_msg="train loss curve")
    np.testing.assert_allclose(
        f_hist["val_loss"], t_hist["val_loss"], rtol=6e-2,
        err_msg="val loss curve (metrics.csv 'Val Loss')")
    # selection metric: argmax class maps quantize fp drift to pixel flips
    delta = np.abs(np.asarray(f_hist["val_measure"])
                   - np.asarray(t_hist["val_measure"]))
    np.testing.assert_allclose(
        f_hist["val_measure"], t_hist["val_measure"], atol=2e-2,
        err_msg="val dice-no-bg curve (metrics.csv 'Val Test Measure Mean')")
    # the DECISIONS must agree exactly... (rtol 1e-6 only absorbs the f32
    # round-trip of the logged LR; decays are factor-2 jumps)
    np.testing.assert_allclose(
        f_hist["lr"], t_hist["lr"], rtol=1e-6,
        err_msg="ReduceLROnPlateau LR sequence")
    assert f_best == t_best, (
        f"best-ckpt epoch: ours {f_best} vs reference {t_best} "
        f"(ours {f_hist['val_measure']}, ref {t_hist['val_measure']})")
    # ...and must not have been knife-edge (see module docstring)
    _assert_decisions_not_knife_edge(t_hist["val_measure"], delta)


# ------------------------------------------------------------------- tests
@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        write_synth_dataset,
    )

    root = tmp_path_factory.mktemp("traj")
    write_synth_dataset(str(root), 6, size=64, seed=3, folds=0)
    return str(root)


def _base_cfg(tmp_path, synth_root, assets_dir, img_size, lr, epochs):
    return dict(
        save_path=str(tmp_path / "runs"),
        data_root=synth_root,
        tree_root=str(assets_dir / "class_tree_tl.json"),
        class_map=str(assets_dir / "class_map.csv"),
        model_select=0, model_type=1, img_size=img_size, batch_size=B,
        val_batch=VB, lr=lr, level_weights=LW, lambda_cons=1.0,
        lambda_kl=0.0, lrs=True, lrs_min=MIN_LR, epochs=epochs,
        num_workers=2, folds=1, seed=0, nan_probe_every=0,
    )


def _copy_film_and_heads(tmodel, init_params, heads_attr, depth=2):
    import torch

    heads = getattr(tmodel, heads_attr)
    for L in range(depth):
        k = np.asarray(init_params[f"head_l{L}"]["kernel"])
        conv = heads[L].conv if hasattr(heads[L], "conv") else heads[L]
        conv.weight.data = torch.from_numpy(
            np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
        conv.bias.data = torch.from_numpy(
            np.asarray(init_params[f"head_l{L}"]["bias"]).copy())
    for L in range(1, depth):
        w = np.asarray(init_params[f"film_l{L}"]["mlp"]["kernel"])
        tmodel.films[L - 1].mlp[1].weight.data = torch.from_numpy(
            np.ascontiguousarray(w.T))
        tmodel.films[L - 1].mlp[1].bias.data = torch.from_numpy(
            np.asarray(init_params[f"film_l{L}"]["mlp"]["bias"]).copy())


def test_unet_trajectory_parity(ref_models, default_tree, tmp_path,
                                assets_dir, synth_root):
    S, LR, EPOCHS = 32, 1e-3, 8
    from test_reference_parity import _copy_double_conv

    train_b = build_fixed_batches(default_tree, synth_root, B, S)
    val_b = build_fixed_batches(default_tree, synth_root, VB, S, limit=2)
    assert len(train_b) == 3 and len(val_b) == 2
    save_loc = str(tmp_path / "runs" / "fold_1")
    cfg_kwargs = _base_cfg(tmp_path, synth_root, assets_dir, S, LR, EPOCHS)
    f_hist, (init_params, init_stats), f_best = run_jax_trainer(
        cfg_kwargs, default_tree, train_b, val_b, save_loc)

    # ---- identical init into the reference model --------------------------
    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))
    tmodel = ref_models.UNet(size=S, n_channels=3, hierarchy=tree_dict,
                             model_type=1)
    bp, bs = init_params["backbone"], init_stats["backbone"]
    _copy_double_conv(tmodel.inc0.conv, bp["inc"], bs["inc"])
    for i in range(1, 5):
        _copy_double_conv(getattr(tmodel, f"down{i}").mpconv[1],
                          bp[f"down{i}"]["conv"], bs[f"down{i}"]["conv"])
        _copy_double_conv(getattr(tmodel, f"up{i}").conv,
                          bp[f"up{i}"]["conv"], bs[f"up{i}"]["conv"])
    _copy_film_and_heads(tmodel, init_params, "heads")

    t_hist, t_best = run_torch_trajectory(
        tmodel, default_tree, train_b, val_b,
        forward=lambda xt: tmodel(xt, type=1, hierarchy=tree_dict),
        lr=LR, epochs=EPOCHS)

    assert_trajectories_match(f_hist, t_hist, f_best, t_best, EPOCHS)


def test_flat_unet_trajectory_parity(ref_models, default_tree, tmp_path,
                                     assets_dir, synth_root):
    """model_type=0 arm: single leaf head, plain one-hot targets (no ternary
    encoding), CE+Dice with the reference's published flat class weights
    (README.md:71-91), no consistency term (train.py:146 hasattr gate), flat
    metric = full-confusion dice with the global background entry dropped.
    Pins the training machinery behind the recipe table's flat columns.

    6 epochs, not 8: the flat arm learns slower (tiny background weight,
    no composition gating), so argmax stays near-tie longer and the
    accumulated AdamW fp drift crosses the 0.02 dice tolerance at epoch
    ~8 (measured 0.034); through epoch 6 drift stays <= 0.017 and every
    plateau/best decision clears the knife-edge guard."""
    S, LR, EPOCHS = 32, 1e-3, 6
    FLAT_LW = [[0.0285, 1.5159, 0.9227, 1.4842, 0.2532, 1.0, 3.8021]]
    from test_reference_parity import _copy_double_conv

    train_b = build_fixed_batches(default_tree, synth_root, B, S,
                                  hierarchical=False)
    val_b = build_fixed_batches(default_tree, synth_root, VB, S, limit=2,
                                hierarchical=False)
    assert train_b[0][1].shape[-1] == default_tree.num_leaves == 7
    save_loc = str(tmp_path / "runs" / "fold_1")
    cfg_kwargs = _base_cfg(tmp_path, synth_root, assets_dir, S, LR, EPOCHS)
    cfg_kwargs.update(model_type=0, level_weights=FLAT_LW)
    f_hist, (init_params, init_stats), f_best = run_jax_trainer(
        cfg_kwargs, default_tree, train_b, val_b, save_loc)

    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))
    import torch

    tmodel = ref_models.UNet(size=S, n_channels=3, hierarchy=tree_dict,
                             model_type=0)
    bp, bs = init_params["backbone"], init_stats["backbone"]
    _copy_double_conv(tmodel.inc0.conv, bp["inc"], bs["inc"])
    for i in range(1, 5):
        _copy_double_conv(getattr(tmodel, f"down{i}").mpconv[1],
                          bp[f"down{i}"]["conv"], bs[f"down{i}"]["conv"])
        _copy_double_conv(getattr(tmodel, f"up{i}").conv,
                          bp[f"up{i}"]["conv"], bs[f"up{i}"]["conv"])
    k = np.asarray(init_params["head_flat"]["kernel"])
    tmodel.out_flat.conv.weight.data = torch.from_numpy(
        np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
    tmodel.out_flat.conv.bias.data = torch.from_numpy(
        np.asarray(init_params["head_flat"]["bias"]).copy())

    t_hist, t_best = run_torch_trajectory(
        tmodel, default_tree, train_b, val_b,
        forward=lambda xt: tmodel(xt, type=0, hierarchy=tree_dict),
        lr=LR, epochs=EPOCHS, lw=FLAT_LW, flat=True)

    assert_trajectories_match(f_hist, t_hist, f_best, t_best, EPOCHS)


def test_unet_extended_tree_trajectory_parity(ref_models, extended_tree,
                                              tmp_path, assets_dir):
    """Depth-4 variant (class_tree_tl_extended.json): the recurrent level
    loop runs FOUR backbone passes with three FiLM stages and three grouped-
    softmax compositions (reference models.py:257-306 at depth 4), and the
    consistency term spans three parent levels. Same artifact-level
    assertions as the depth-2 tests.

    This test is the one place the logits-vs-composed-probs metric
    distinction (see run_torch_trajectory) is load-bearing: level 2 has two
    parent groups and level 3 three, so argmax(logits) != argmax(P_c).
    Data seed 7 selected for decisive trajectories (seed 3 put one plateau
    decision within measured drift of the threshold; drift here is
    ~3e-3 dice once both sides score the reference's metric)."""
    S, LR, EPOCHS = 32, 1e-3, 6
    # per-level class weights sized [2, 2, 4, 3] (no published extended
    # recipe exists — irregular values exercise the weighting code paths)
    LW4 = [[0.03, 1.5], [1.2, 0.8], [1.5, 0.3, 1.0, 0.9], [1.5, 0.26, 1.04]]
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        write_synth_dataset,
    )

    synth_root = str(tmp_path / "data")
    write_synth_dataset(synth_root, 6, size=64, seed=7, folds=0)
    from test_reference_parity import _copy_double_conv

    train_b = build_fixed_batches(extended_tree, synth_root, B, S)
    val_b = build_fixed_batches(extended_tree, synth_root, VB, S, limit=2)
    save_loc = str(tmp_path / "runs" / "fold_1")
    cfg_kwargs = _base_cfg(tmp_path, synth_root, assets_dir, S, LR, EPOCHS)
    cfg_kwargs.update(
        tree_root=str(assets_dir / "class_tree_tl_extended.json"),
        class_map=str(assets_dir / "class_map_extended.csv"),
        level_weights=LW4,
    )
    f_hist, (init_params, init_stats), f_best = run_jax_trainer(
        cfg_kwargs, extended_tree, train_b, val_b, save_loc)

    tree_dict = json.load(
        open(os.path.join(REF, "class_tree_tl_extended.json")))
    tmodel = ref_models.UNet(size=S, n_channels=3, hierarchy=tree_dict,
                             model_type=1)
    bp, bs = init_params["backbone"], init_stats["backbone"]
    _copy_double_conv(tmodel.inc0.conv, bp["inc"], bs["inc"])
    for i in range(1, 5):
        _copy_double_conv(getattr(tmodel, f"down{i}").mpconv[1],
                          bp[f"down{i}"]["conv"], bs[f"down{i}"]["conv"])
        _copy_double_conv(getattr(tmodel, f"up{i}").conv,
                          bp[f"up{i}"]["conv"], bs[f"up{i}"]["conv"])
    _copy_film_and_heads(tmodel, init_params, "heads",
                         depth=extended_tree.num_levels)

    t_hist, t_best = run_torch_trajectory(
        tmodel, extended_tree, train_b, val_b,
        forward=lambda xt: tmodel(xt, type=1, hierarchy=tree_dict),
        lr=LR, epochs=EPOCHS, lw=LW4)

    assert_trajectories_match(f_hist, t_hist, f_best, t_best, EPOCHS)


def test_hrnet_trajectory_parity(ref_models, default_tree, tmp_path,
                                 assets_dir, monkeypatch):
    # 64px (so no branch degenerates to 1x1) and a decisive LR: the metric
    # must move by more than cross-framework fp drift (~0.02 dice early on,
    # when near-uniform logits make argmax flips cheap) for every plateau/
    # best decision to clear the knife-edge guard. Data seed 17 selected for
    # exactly that (searched 5/11/17/23/31; 23 and 31 put one plateau
    # decision within drift of the threshold — see module docstring).
    S, LR, EPOCHS = 64, 3e-3, 6
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        write_synth_dataset,
    )

    synth_root = str(tmp_path / "data")
    write_synth_dataset(synth_root, 6, size=64, seed=17, folds=0)
    import torch

    from test_reference_parity_hrnet import _flatten, small_cfg_dicts

    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
        HierarchicalSegmenter,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.torch_import import (
        translate_flax_path,
    )

    ours_cfg, theirs_cfg = small_cfg_dicts()

    def small_hrnet(tree, model_select, model_type, *a, **k):
        return HierarchicalSegmenter(
            tree=tree, backbone=HRNetBackbone(config=ours_cfg),
            hierarchical=True, final_conv_kernel=1, align_corners=True,
        )

    monkeypatch.setattr(
        "restrictive_hierarchical_semantic_segmentation_tpu.train.loop."
        "build_model", small_hrnet)

    train_b = build_fixed_batches(default_tree, synth_root, B, S)
    val_b = build_fixed_batches(default_tree, synth_root, VB, S, limit=3)
    save_loc = str(tmp_path / "runs" / "fold_1")
    cfg_kwargs = _base_cfg(tmp_path, synth_root, assets_dir, S, LR, EPOCHS)
    f_hist, (init_params, init_stats), f_best = run_jax_trainer(
        cfg_kwargs, default_tree, train_b, val_b, save_loc)

    # ---- identical init via the reverse donor-import translation ----------
    tree_dict = json.load(open(os.path.join(REF, "class_tree_tl.json")))
    tmodel = ref_models.HighResolutionNet(
        config=theirs_cfg, hierarchy=tree_dict, model_type=1)
    sd = {}
    for coll, treevars in (("params", init_params),
                           ("batch_stats", init_stats)):
        for path, v in _flatten(treevars).items():
            a = np.asarray(v)
            if path[-1] == "kernel":
                a = a.transpose(3, 2, 0, 1) if a.ndim == 4 else a.T
            cands = translate_flax_path(path, coll, model_select=1)
            if cands:
                sd[cands[0]] = torch.from_numpy(np.ascontiguousarray(a))
    tmodel.load_state_dict(sd, strict=False)
    _copy_film_and_heads(tmodel, init_params, "classifiers")

    t_hist, t_best = run_torch_trajectory(
        tmodel, default_tree, train_b, val_b,
        forward=lambda xt: tmodel(xt), lr=LR, epochs=EPOCHS)

    assert_trajectories_match(f_hist, t_hist, f_best, t_best, EPOCHS)
