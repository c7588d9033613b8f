"""Model shape/jit/semantics tests (8-device CPU backend)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.config.hrnet import (
    HRNetConfig,
    HRNetStage,
    hrnet_w48,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (
    HRNetBackbone,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.unet import (
    UNetBackbone,
)
from restrictive_hierarchical_semantic_segmentation_tpu.models.hierarchical import (
    HierarchicalSegmenter,
    build_model,
)


def tiny_hrnet():
    """A width-4, 1-module HRNet for fast tests (same topology rules as W48)."""
    return HRNetConfig(
        stage1=HRNetStage(1, 1, "BOTTLENECK", (1,), (4,)),
        stage2=HRNetStage(1, 2, "BASIC", (1, 1), (4, 8)),
        stage3=HRNetStage(1, 3, "BASIC", (1, 1, 1), (4, 8, 16)),
        stage4=HRNetStage(1, 4, "BASIC", (1, 1, 1, 1), (4, 8, 16, 32)),
    )


def test_unet_backbone_shapes():
    m = UNetBackbone(base_ch=8)
    x = jnp.zeros((1, 36, 36, 3))  # not divisible by 16 -> exercises pad-to-match
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vars_, x, train=False)
    assert y.shape == (1, 36, 36, 8)
    # 620-like odd path (downsampled to keep the test fast)
    x2 = jnp.zeros((1, 52, 52, 3))
    assert m.apply(vars_, x2, train=False).shape == (1, 52, 52, 8)


def test_hrnet_backbone_shapes():
    cfg = tiny_hrnet()
    m = HRNetBackbone(config=cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(vars_, x, train=False)
    assert y.shape == (1, 16, 16, cfg.last_channels)
    assert cfg.last_channels == 4 + 8 + 16 + 32


def test_hrnet_w48_channel_plan():
    assert hrnet_w48().last_channels == 720


def test_shared_head_sum_concat_identity():
    """The decomposed shared head (per-branch 1x1 conv + resize, summed) is
    mathematically identical to the reference dataflow (resize-all, concat,
    one 1x1 conv): a 1x1 conv is channel-linear and bilinear resize is
    spatial-linear, so they commute exactly. Exact in f32; bf16 differs only
    by rounding (different accumulation order)."""
    from restrictive_hierarchical_semantic_segmentation_tpu.models.backbones.hrnet import (  # noqa: E501
        SharedHead1x1,
    )

    xs = [
        jax.random.normal(jax.random.PRNGKey(i), (2, s, s, c))
        for i, (s, c) in enumerate([(16, 12), (8, 24), (4, 48)])
    ]
    for ac in (True, False):
        sum_head = SharedHead1x1(in_ch=84, out_ch=60, align_corners=ac,
                                 mode="sum")
        cat_head = SharedHead1x1(in_ch=84, out_ch=60, align_corners=ac,
                                 mode="concat")
        v = sum_head.init(jax.random.PRNGKey(7), xs, (16, 16))
        # same single (1,1,in,out) kernel + bias as nn.Conv -> checkpoint/
        # donor-import compatible between modes
        assert v["params"]["kernel"].shape == (1, 1, 84, 60)
        a = sum_head.apply(v, xs, (16, 16))
        b = cat_head.apply(v, xs, (16, 16))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)


def test_hrnet_backbone_head_modes_match():
    """Full backbone forward agrees between head modes with shared params."""
    cfg = tiny_hrnet()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    m_sum = HRNetBackbone(config=cfg, head_mode="sum")
    m_cat = HRNetBackbone(config=cfg, head_mode="concat")
    vars_ = m_sum.init(jax.random.PRNGKey(0), x, train=False)
    a = m_sum.apply(vars_, x, train=False)
    b = m_cat.apply(vars_, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_flat_model(default_tree):
    m = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=False
    )
    x = jnp.zeros((2, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    probs, logits, qs = m.apply(vars_, x, train=False)
    assert probs is None and qs is None
    assert len(logits) == 1 and logits[0].shape == (2, 32, 32, 7)


@pytest.mark.parametrize("backbone_kind", ["unet", "hrnet"])
def test_hier_model_composition(default_tree, backbone_kind):
    if backbone_kind == "unet":
        bb = UNetBackbone(base_ch=8)
    else:
        bb = HRNetBackbone(config=tiny_hrnet())
    m = HierarchicalSegmenter(tree=default_tree, backbone=bb, hierarchical=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    probs, logits, qs = m.apply(vars_, x, train=False)
    assert [p.shape[-1] for p in probs] == [4, 4]
    assert [z.shape for z in logits] == [(1, 32, 32, 4)] * 2
    # restrictive composition: children of tooth sum to P_tooth exactly
    np.testing.assert_allclose(
        np.asarray(probs[1]).sum(-1), np.asarray(probs[0][..., 3]),
        rtol=1e-5, atol=1e-6,
    )
    # level-0 parents are independent sigmoids in (0, 1)
    p0 = np.asarray(probs[0])
    assert (p0 > 0).all() and (p0 < 1).all()
    assert qs[0] is None and qs[1].shape == (1, 32, 32, 4)


def test_hier_model_extended_tree(extended_tree):
    m = HierarchicalSegmenter(
        tree=extended_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    probs, logits, _ = m.apply(vars_, x, train=False)
    assert [p.shape[-1] for p in probs] == [2, 2, 4, 3]
    # depth-3 healthy children sum to P_healthy (channel 3 at level 2)
    np.testing.assert_allclose(
        np.asarray(probs[3]).sum(-1), np.asarray(probs[2][..., 3]),
        rtol=1e-5, atol=1e-6,
    )


def test_backbone_weight_sharing(default_tree):
    """The backbone must be re-run with SHARED params across levels."""
    m = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = jnp.zeros((1, 16, 16, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    params = vars_["params"]
    assert "backbone" in params  # exactly one backbone param subtree
    assert "film_l1" in params and "head_l0" in params and "head_l1" in params
    n_backbones = sum(1 for k in params if k.startswith("backbone"))
    assert n_backbones == 1


def test_bn_stats_updated_per_level(default_tree):
    """Train-mode apply with mutable batch_stats must run without error and
    update stats (the reference updates BN running stats D times per step)."""
    m = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    out, updates = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(vars_["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_concat_prev_probs_variant(default_tree):
    m = HierarchicalSegmenter(
        tree=default_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True,
        concat_prev_probs=True,
    )
    x = jnp.zeros((1, 16, 16, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x, train=False)
    probs, logits, _ = m.apply(vars_, x, train=False)
    assert [p.shape[-1] for p in probs] == [4, 4]
    # backbone input conv must see 3 + max_level_width channels
    kernel = vars_["params"]["backbone"]["inc"]["conv0"]["kernel"]
    assert kernel.shape[2] == 3 + 4


def test_build_model_factory(default_tree):
    m = build_model(default_tree, model_select=0, model_type=0)
    assert not m.hierarchical
    m2 = build_model(default_tree, model_select=1, model_type=1)
    assert m2.hierarchical and m2.backbone.feature_dim == 720


def test_composition_property_all_parents(extended_tree):
    """SURVEY §4 property: at every level, for every parent with children,
    sum(P_children) == P_parent exactly (restrictive composition), and all
    probabilities live in [0, 1]."""
    m = HierarchicalSegmenter(
        tree=extended_tree, backbone=UNetBackbone(base_ch=8), hierarchical=True
    )
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 3))
    vars_ = m.init(jax.random.PRNGKey(4), x, train=False)
    probs, _, qs = m.apply(vars_, x, train=False)
    t = extended_tree
    for L in range(t.num_levels):
        p = np.asarray(probs[L])
        assert (p >= 0).all() and (p <= 1 + 1e-6).all(), f"level {L}"
    for L in range(1, t.num_levels):
        pidx = np.asarray(t.parent_index[L])
        for p_i in t.parents_with_children[L].tolist():
            members = [c for c in range(len(pidx)) if int(pidx[c]) == p_i]
            child_sum = np.asarray(probs[L])[..., members].sum(-1)
            np.testing.assert_allclose(
                child_sum, np.asarray(probs[L - 1])[..., p_i],
                rtol=1e-5, atol=1e-6,
                err_msg=f"level {L} parent {p_i}",
            )
        # Q sums to 1 within every group
        q = np.asarray(qs[L])
        for p_i in t.parents_with_children[L].tolist():
            members = [c for c in range(len(pidx)) if int(pidx[c]) == p_i]
            np.testing.assert_allclose(q[..., members].sum(-1), 1.0, rtol=1e-5)
