"""Shared-backbone-pass equivalence (VERDICT r1 item #1).

The reference re-runs the donor backbone once per tree level with an
*unchanged* input (models.py:277 ``dL = self._run_unet(x)``; models.py:773),
so the D passes are mathematically one pass. ``share_backbone=True`` computes
features once; these tests pin that against the naive D-run form:

* forward outputs identical (train and eval mode);
* one full train step: identical loss, gradients/params, and — via the
  closed-form ``bn_ema_correction`` — identical BN running statistics to the
  reference's D-updates-per-step semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np

from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
    UNetBackbone,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
    HierarchicalSegmenter,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.state import (
    create_train_state,
)
from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
    bn_ema_correction,
    make_train_step,
)

from test_train_steps import make_batch


def _models(tree):
    shared = HierarchicalSegmenter(
        tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=True,
        share_backbone=True,
    )
    naive = HierarchicalSegmenter(
        tree=tree, backbone=UNetBackbone(base_ch=8), hierarchical=True,
        share_backbone=False,
    )
    return shared, naive


def test_bn_updates_per_step_property(default_tree):
    shared, naive = _models(default_tree)
    assert shared.bn_updates_per_step == default_tree.num_levels == 2
    assert naive.bn_updates_per_step == 1
    flat = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=False
    )
    assert flat.bn_updates_per_step == 1
    concat = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True,
        concat_prev_probs=True,
    )
    assert concat.bn_updates_per_step == 1


def test_forward_identical_shared_vs_naive(default_tree):
    shared, naive = _models(default_tree)
    rng = np.random.default_rng(1)
    x, _ = make_batch(default_tree, rng, B=2, S=16)
    variables = shared.init(jax.random.PRNGKey(0), x, train=False)
    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        out_s = shared.apply(variables, x, train=train, **kw)
        out_n = naive.apply(variables, x, train=train, **kw)
        if train:
            out_s, _ = out_s
            out_n, _ = out_n
        for a, b in zip(out_s.logits_per_level, out_n.logits_per_level):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(out_s.probs_per_level, out_n.probs_per_level):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bn_ema_correction_closed_form():
    """nD(ra, v) via the correction == D sequential EMA updates."""
    m, d = 0.9, 4
    ra = np.array([0.3, -1.2, 5.0], np.float32)
    v = np.array([1.1, 0.4, -2.0], np.float32)
    seq = ra.copy()
    for _ in range(d):
        seq = m * seq + (1 - m) * v
    one = m * ra + (1 - m) * v
    got = bn_ema_correction(
        {"s": jnp.asarray(ra)}, {"s": jnp.asarray(one)}, m, d
    )["s"]
    np.testing.assert_allclose(np.asarray(got), seq, rtol=1e-6)
    # d=1 is the identity
    same = bn_ema_correction({"s": ra}, {"s": one}, m, 1)["s"]
    np.testing.assert_array_equal(np.asarray(same), one)


def test_train_step_equivalence_incl_running_stats(default_tree):
    """One full train step, shared vs naive: loss, params, and batch_stats all
    match — the D-times-EMA reference semantics survive the sharing."""
    shared, naive = _models(default_tree)
    rng = np.random.default_rng(2)
    x, y = make_batch(default_tree, rng, B=2, S=16)
    mask = jnp.ones((2,), jnp.float32)

    state_s, tx_s = create_train_state(shared, jax.random.PRNGKey(3), x[:1], 1e-3)
    state_n, tx_n = create_train_state(naive, jax.random.PRNGKey(3), x[:1], 1e-3)
    # identical initialization (same structure, same seed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state_s.params, state_n.params,
    )

    step_s = make_train_step(shared, tx_s, default_tree, True, donate=False)
    # the naive model performs the reference's D natural sequential EMA
    # updates by invoking the backbone D times (bn_updates_per_step == 1)
    step_n = make_train_step(naive, tx_n, default_tree, True, donate=False)

    state_s, aux_s = step_s(state_s, x, y, mask)
    state_n, aux_n = step_n(state_n, x, y, mask)

    # identical forward => identical loss
    assert float(aux_s["loss"]) == float(aux_n["loss"])
    # BN running stats: shared pass + closed-form D-times correction vs the
    # naive model's D real sequential updates (fp-level agreement only —
    # different association order)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        state_s.batch_stats, state_n.batch_stats,
    )

    # gradients: sum over levels through one shared pass == sum over D passes
    # (linearity); compare directly (param-space multi-step comparison is
    # chaotic: AdamW normalizes near-zero grads by near-zero second moments)
    from restrictive_hierarchical_semantic_segmentation_tpu.losses.hierarchical import (
        hierarchical_loss,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        split_targets,
    )

    def grads_of(model, state):
        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                jnp.asarray(x), train=True, mutable=["batch_stats"],
            )
            tgt = split_targets(default_tree, jnp.asarray(y), True)
            total, _ = hierarchical_loss(
                out.logits_per_level, tgt, None,
                probs_per_level=out.probs_per_level,
                q_per_level=out.q_per_level, tree=default_tree,
            )
            return total

        return jax.grad(loss_fn)(state.params)

    g_s = grads_of(shared, state_s)
    # evaluate the naive model's grads at the SAME point for a clean compare
    g_n = grads_of(naive, state_s)
    flat_s = jnp.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(g_s)])
    flat_n = jnp.concatenate([v.ravel() for v in jax.tree_util.tree_leaves(g_n)])
    denom = float(jnp.linalg.norm(flat_n)) + 1e-12
    rel = float(jnp.linalg.norm(flat_s - flat_n)) / denom
    assert rel < 5e-5, f"relative grad diff {rel}"


def test_conv_policy_remat_matches_no_remat(default_tree):
    """remat="conv" (save conv outputs, recompute elementwise tails) must be
    numerically identical to no-remat — it only changes WHAT backward saves."""
    rng = np.random.default_rng(5)
    x, y = make_batch(default_tree, rng, B=2, S=16)
    mask = jnp.ones((2,), jnp.float32)

    models = {
        mode: HierarchicalSegmenter(
            tree=default_tree, backbone=UNetBackbone(base_ch=8),
            hierarchical=True, remat=mode,
        )
        for mode in (False, "conv")
    }
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )

    states = {}
    for mode, m in models.items():
        state, tx = create_train_state(m, jax.random.PRNGKey(7), x[:1], 1e-3)
        step = make_train_step(m, tx, default_tree, True, donate=False)
        states[mode] = step(state, x, y, mask)
    (s0, a0), (s1, a1) = states[False], states["conv"]
    np.testing.assert_allclose(float(a0["loss"]), float(a1["loss"]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        s0.params, s1.params,
    )


def test_hrnet_conv_policy_remat_matches(default_tree):
    from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
        HRNetConfig,
        HRNetStage,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
        HRNetBackbone,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        make_train_step,
    )

    cfg = HRNetConfig(
        stage1=HRNetStage(1, 1, "BOTTLENECK", (1,), (4,)),
        stage2=HRNetStage(1, 2, "BASIC", (1, 1), (4, 8)),
        stage3=HRNetStage(1, 3, "BASIC", (1, 1, 1), (4, 8, 16)),
        stage4=HRNetStage(1, 4, "BASIC", (1, 1, 1, 1), (4, 8, 16, 32)),
    )
    rng = np.random.default_rng(6)
    x, y = make_batch(default_tree, rng, B=2, S=32)
    mask = jnp.ones((2,), jnp.float32)
    results = {}
    for mode in (False, "conv", "module"):
        m = HierarchicalSegmenter(
            tree=default_tree, backbone=HRNetBackbone(config=cfg, remat=mode),
            hierarchical=True,
        )
        state, tx = create_train_state(m, jax.random.PRNGKey(9), x[:1], 1e-3)
        step = make_train_step(m, tx, default_tree, True, donate=False)
        results[mode] = step(state, x, y, mask)
    base_loss = float(results[False][1]["loss"])
    for mode in ("conv", "module"):
        np.testing.assert_allclose(
            float(results[mode][1]["loss"]), base_loss, rtol=1e-6,
            err_msg=str(mode),
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            results[False][0].params, results[mode][0].params,
        )
