"""Loss parity tests vs torch-CPU oracles implementing the reference's exact
per-batch/per-class loop semantics (Metrics/losses.py:16-177), including the
NaN conventions."""
import numpy as np
import torch
import torch.nn.functional as F

from restrictive_hierarchical_semantic_segmentation_tpu.losses.hierarchical import (
    consistency_loss,
    hierarchical_loss,
    masked_cross_entropy,
    masked_soft_dice,
)


def make_ternary_targets(rng, B, H, W):
    """Realistic ternary level-1 targets for the default tree: -1 outside
    tooth, 0 inside tooth w/o class, one-hot child inside."""
    parent = rng.integers(0, 4, (B, H, W))  # level-0 class map, 3 == tooth
    l0 = np.eye(4, dtype=np.float32)[parent]  # (B,H,W,4)
    child = rng.integers(0, 5, (B, H, W))  # 4 == "inside tooth, no class"
    l1 = np.zeros((B, H, W, 4), np.float32)
    for c in range(4):
        l1[..., c] = (child == c) & (parent == 3)
    l1 = np.where((parent != 3)[..., None], -1.0, l1)
    return l0, l1


def ce_oracle(logits_nchw, targets_nchw, w):
    logp = F.log_softmax(logits_nchw, 1)
    B, C = targets_nchw.shape[:2]
    items = []
    for b in range(B):
        loss = 0.0
        for c in range(C):
            m = targets_nchw[b, c] != -1
            sel_lp, sel_t = logp[b, c][m], targets_nchw[b, c][m]
            loss = loss + (-(sel_t * sel_lp * w[c]).mean())
        items.append(loss / C)
    items = [torch.nan_to_num(l, nan=1.0) for l in items]
    return torch.stack(items).mean()


def dice_oracle(logits_nchw, targets_nchw, w, smooth=0.0):
    B, C = targets_nchw.shape[:2]
    probs = F.softmax(logits_nchw, 1).reshape(B, C, -1)
    t = targets_nchw.reshape(B, C, -1)
    vals = []
    for b in range(B):
        mask = t[b] != -1
        inter, union = 0.0, 0.0
        for c in range(C):
            ic, tc = probs[b, c][mask[c]], t[b, c][mask[c]]
            inter = inter + (ic * tc * w[c]).sum()
            union = union + (ic * w[c]).sum() + (tc * w[c]).sum()
        vals.append(1.0 - (2 * inter + smooth) / (union + smooth))
    vals = [v for v in vals if not torch.isnan(v)]
    return torch.stack(vals).mean() if vals else None


def test_masked_ce_matches_oracle():
    rng = np.random.default_rng(0)
    _, t = make_ternary_targets(rng, 3, 12, 10)
    z = rng.standard_normal((3, 12, 10, 4)).astype(np.float32)
    w = np.array([1.5432, 0.2638, 1.0413, 3.9722], np.float32)
    got = float(masked_cross_entropy(z, t, w))
    want = float(ce_oracle(
        torch.from_numpy(z).permute(0, 3, 1, 2),
        torch.from_numpy(t).permute(0, 3, 1, 2), w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_ce_empty_class_is_one():
    """An item whose parent region is empty (all -1) must cost exactly 1.0."""
    rng = np.random.default_rng(1)
    _, t = make_ternary_targets(rng, 2, 8, 8)
    t[1] = -1.0  # second item fully outside the parent
    z = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    w = np.ones(4, np.float32)
    got = float(masked_cross_entropy(z, t, w))
    want = float(ce_oracle(
        torch.from_numpy(z).permute(0, 3, 1, 2),
        torch.from_numpy(t).permute(0, 3, 1, 2), w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_dice_matches_oracle():
    rng = np.random.default_rng(2)
    _, t = make_ternary_targets(rng, 4, 12, 10)
    t[2] = -1.0  # one fully-invalid item -> dropped (NaN path)
    z = rng.standard_normal((4, 12, 10, 4)).astype(np.float32)
    w = np.array([1.5432, 0.2638, 1.0413, 3.9722], np.float32)
    dsum, dcnt = masked_soft_dice(z, t, w)
    got = float(dsum) / max(float(dcnt), 1.0)
    assert float(dcnt) == 3.0
    want = float(dice_oracle(
        torch.from_numpy(z).permute(0, 3, 1, 2),
        torch.from_numpy(t).permute(0, 3, 1, 2), w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_consistency_matches_oracle(default_tree, extended_tree):
    rng = np.random.default_rng(3)
    for t in (default_tree, extended_tree):
        probs = [
            rng.uniform(0, 1, (2, 6, 6, c)).astype(np.float32)
            for c in t.classes_per_level
        ]
        got = float(consistency_loss(probs, t))
        # oracle: reference losses.py:150-177
        total, count = 0.0, 0
        for L in range(1, t.num_levels):
            for p_idx, p_name in enumerate(t.levels[L - 1]):
                ch_idx = [i for i, cn in enumerate(t.levels[L])
                          if t.parent_name.get(cn) == p_name]
                if not ch_idx:
                    continue
                s = probs[L][..., ch_idx].sum(-1)
                total += np.abs(s - probs[L - 1][..., p_idx]).mean()
                count += 1
        np.testing.assert_allclose(got, total / count, rtol=1e-5)


def test_hierarchical_loss_assembly(default_tree):
    rng = np.random.default_rng(4)
    l0, l1 = make_ternary_targets(rng, 2, 8, 8)
    targets = [l0, l1]
    logits = [rng.standard_normal((2, 8, 8, 4)).astype(np.float32) for _ in range(2)]
    probs = [1 / (1 + np.exp(-logits[0])),
             rng.uniform(0, 1, (2, 8, 8, 4)).astype(np.float32)]
    lw = [[0.0297, 1.577, 0.9619, 0.1770], [1.5432, 0.2638, 1.0413, 3.9722]]
    total, per_level = hierarchical_loss(
        logits, targets, lw, probs_per_level=probs, tree=default_tree
    )
    assert per_level.shape == (2,)
    # total = sum(levels) + consistency
    cons = float(consistency_loss(probs, default_tree))
    np.testing.assert_allclose(
        float(total), float(per_level.sum()) + cons, rtol=1e-5
    )
    # level-0 pretrain masking removes level-1 supervision
    total_masked, _ = hierarchical_loss(
        logits, targets, lw, probs_per_level=probs, tree=default_tree,
        level_mask=[1.0, 0.0],
    )
    np.testing.assert_allclose(
        float(total_masked), float(per_level[0]) + cons, rtol=1e-5
    )


def test_hierarchical_loss_is_differentiable(default_tree):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    l0, l1 = make_ternary_targets(rng, 1, 8, 8)

    def f(z0, z1):
        p0 = jax.nn.sigmoid(z0)
        from restrictive_hierarchical_semantic_segmentation_tpu.ops.restrictive import (
            gated_grouped_softmax,
        )
        _, p1 = gated_grouped_softmax(
            z1, p0, default_tree.parent_index[1], default_tree.child_to_parent[1]
        )
        total, _ = hierarchical_loss(
            [z0, z1], [l0, l1], None, probs_per_level=[p0, p1],
            tree=default_tree,
        )
        return total

    z0 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    z1 = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    g0, g1 = jax.grad(f, argnums=(0, 1))(z0, z1)
    assert np.isfinite(np.asarray(g0)).all() and np.isfinite(np.asarray(g1)).all()
    assert np.abs(np.asarray(g1)).max() > 0  # consistency/CE reach level-1 logits
