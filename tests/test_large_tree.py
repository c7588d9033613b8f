"""Large-tree envelope for the restrictive ops (VERDICT r1 item #10).

The default paper trees have fanout <= 4, where per-group unrolled reductions
are optimal. For wide trees the ops switch to a vectorized segment
formulation (ops/restrictive.py GROUP_UNROLL_LIMIT); these property tests pin
the two paths against each other and the composition invariants on a
synthetic 16-parent / 64-class tree.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
    ClassTree,
)
from restrictive_hierarchical_semantic_segmentation_tpu.losses.hierarchical import (
    consistency_loss,
)
from restrictive_hierarchical_semantic_segmentation_tpu.ops import restrictive


@pytest.fixture(scope="module")
def wide_tree():
    """background + 15 organs, each organ with 2-6 leaf parts (~64 classes)."""
    rng = np.random.default_rng(0)
    tree = {"background": {}}
    class_map = {"background": 0}
    px = 1
    for i in range(15):
        organ = f"organ{i}"
        kids = {}
        for j in range(int(rng.integers(2, 7))):
            leaf = f"{organ}_part{j}"
            kids[leaf] = {}
            class_map[leaf] = px
            px += 1
        tree[organ] = kids
        class_map[organ] = None
    return ClassTree.from_dict(tree, class_map)


def _rand_level_inputs(tree, rng, hw=6):
    c_parent = tree.classes_per_level[0]
    c_child = tree.classes_per_level[1]
    z = jnp.asarray(rng.standard_normal((2, hw, hw, c_child)), jnp.float32)
    p = jnp.asarray(rng.uniform(0.01, 1.0, (2, hw, hw, c_parent)), jnp.float32)
    return z, p


def test_wide_tree_uses_segment_path(wide_tree):
    assert len(wide_tree.parents_with_children[1]) == 15
    assert 15 > restrictive.GROUP_UNROLL_LIMIT


def test_gated_grouped_softmax_paths_agree(wide_tree, monkeypatch):
    rng = np.random.default_rng(1)
    z, p = _rand_level_inputs(wide_tree, rng)
    args = (z, p, wide_tree.parent_index[1], wide_tree.child_to_parent[1])
    q_seg, pc_seg = restrictive.gated_grouped_softmax(*args)
    monkeypatch.setattr(restrictive, "GROUP_UNROLL_LIMIT", 10_000)
    q_unr, pc_unr = restrictive.gated_grouped_softmax(*args)
    np.testing.assert_allclose(np.asarray(q_seg), np.asarray(q_unr),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pc_seg), np.asarray(pc_unr),
                               rtol=1e-5, atol=1e-6)


def test_wide_tree_composition_invariants(wide_tree):
    """Q sums to 1 within every group; P_child = P_parent * Q <= P_parent."""
    rng = np.random.default_rng(2)
    z, p = _rand_level_inputs(wide_tree, rng)
    q, pc = restrictive.gated_grouped_softmax(
        z, p, wide_tree.parent_index[1], wide_tree.child_to_parent[1]
    )
    a = np.asarray(wide_tree.child_to_parent[1], np.float32)
    group_sum = np.einsum("...c,cp->...p", np.asarray(q), a)
    parents = np.asarray(wide_tree.parents_with_children[1])
    np.testing.assert_allclose(group_sum[..., parents], 1.0, atol=1e-5)
    pidx = np.asarray(wide_tree.parent_index[1])
    p_g = np.asarray(p)[..., pidx]
    assert np.all(np.asarray(pc) <= p_g + 1e-6)
    # exact composition: sum of children == parent prob
    child_sum = np.einsum("...c,cp->...p", np.asarray(pc), a)
    np.testing.assert_allclose(
        child_sum[..., parents], np.asarray(p)[..., parents], rtol=1e-5,
        atol=1e-6,
    )


def test_consistency_loss_paths_agree(wide_tree, monkeypatch):
    rng = np.random.default_rng(3)
    z, p = _rand_level_inputs(wide_tree, rng)
    q, pc = restrictive.gated_grouped_softmax(
        z, p, wide_tree.parent_index[1], wide_tree.child_to_parent[1]
    )
    import restrictive_hierarchical_semantic_segmentation_tpu.ops.restrictive as R

    # composed probabilities satisfy the constraint by construction
    assert float(consistency_loss([p, pc], wide_tree)) < 1e-5
    # a VIOLATING child distribution gives a real loss, equal on both paths
    pc_bad = pc * jnp.asarray(
        np.random.default_rng(7).uniform(0.5, 1.5, pc.shape), jnp.float32
    )
    loss_seg = consistency_loss([p, pc_bad], wide_tree)
    monkeypatch.setattr(R, "GROUP_UNROLL_LIMIT", 10_000)
    loss_unr = consistency_loss([p, pc_bad], wide_tree)
    assert float(loss_seg) > 1e-3
    np.testing.assert_allclose(float(loss_seg), float(loss_unr), rtol=1e-5)


def test_wide_tree_grads_flow_both_paths(wide_tree, monkeypatch):
    rng = np.random.default_rng(4)
    z, p = _rand_level_inputs(wide_tree, rng, hw=4)

    def loss(zz):
        q, pc = restrictive.gated_grouped_softmax(
            zz, p, wide_tree.parent_index[1], wide_tree.child_to_parent[1]
        )
        return jnp.sum(jnp.square(pc))

    g_seg = jax.grad(loss)(z)
    monkeypatch.setattr(restrictive, "GROUP_UNROLL_LIMIT", 10_000)
    g_unr = jax.grad(loss)(z)
    np.testing.assert_allclose(np.asarray(g_seg), np.asarray(g_unr),
                               rtol=1e-4, atol=1e-6)


def test_trace_size_bounded_on_wide_tree(wide_tree):
    """The segment path's jaxpr stays small (no per-parent unrolling)."""
    rng = np.random.default_rng(5)
    z, p = _rand_level_inputs(wide_tree, rng, hw=4)
    jaxpr = jax.make_jaxpr(
        lambda zz, pp: restrictive.gated_grouped_softmax(
            zz, pp, wide_tree.parent_index[1], wide_tree.child_to_parent[1]
        )
    )(z, p)
    assert len(jaxpr.jaxpr.eqns) < 40, len(jaxpr.jaxpr.eqns)
