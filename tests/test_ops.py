"""Op-level parity tests against PyTorch-CPU oracles (torch is used ONLY as a
numerical oracle in tests — the framework itself is pure JAX)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from restrictive_hierarchical_semantic_segmentation_tpu.ops.resize import resize_bilinear
from restrictive_hierarchical_semantic_segmentation_tpu.ops.restrictive import (
    gated_grouped_softmax,
    grouped_conditional_kl,
)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape,size", [((2, 17, 23, 3), (34, 46)),
                                        ((1, 8, 8, 4), (620, 620)),
                                        ((2, 33, 31, 2), (16, 16))])
def test_resize_matches_torch(align, shape, size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(resize_bilinear(x, size, align))
    # torch wants NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = F.interpolate(xt, size=size, mode="bilinear", align_corners=align)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape,size", [((2, 17, 23, 3), (34, 46)),
                                        ((1, 8, 8, 4), (620, 620)),
                                        ((2, 33, 31, 2), (16, 16)),
                                        ((2, 16, 16, 3), (16, 16))])
def test_resize_matmul_formulation_parity(align, shape, size):
    """The gather-free banded-matmul resize (used under fold x space meshes,
    where XLA's partial-manual partitioner rejects gathers on the sharded
    axis) is the same interpolation up to fp reassociation."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(shape).astype(np.float32)
    g = np.asarray(resize_bilinear(x, size, align, method="gather"))
    m = np.asarray(resize_bilinear(x, size, align, method="matmul"))
    np.testing.assert_allclose(m, g, rtol=1e-5, atol=1e-6)
    if size == (shape[1], shape[2]):
        np.testing.assert_array_equal(m, x)  # identity matrix case


def test_resize_method_context():
    from restrictive_hierarchical_semantic_segmentation_tpu.ops.resize import (
        get_default_method, resize_method,
    )

    assert get_default_method() == "gather"
    with resize_method("matmul"):
        assert get_default_method() == "matmul"
    assert get_default_method() == "gather"
    with pytest.raises(ValueError):
        resize_method("nearest").__enter__()


def _torch_grouped_softmax(z, p_prev, groups, level_prev_names):
    """Oracle: the reference's python loop (models.py:286-301), in torch NCHW."""
    eps = 1e-6
    P_list, Q_list = [], []
    start = 0
    for pname, chnames in groups:
        g = len(chnames)
        z_g = z[:, start:start + g]
        p_idx = level_prev_names.index(pname)
        P_p = p_prev[:, p_idx:p_idx + 1]
        Q_g = torch.softmax(z_g + torch.log(P_p + eps), dim=1)
        P_list.append(P_p * Q_g)
        Q_list.append(Q_g)
        start += g
    return torch.cat(Q_list, 1), torch.cat(P_list, 1)


@pytest.mark.parametrize("tree_name", ["default", "extended"])
def test_gated_grouped_softmax_matches_reference_loop(
    tree_name, default_tree, extended_tree
):
    t = default_tree if tree_name == "default" else extended_tree
    rng = np.random.default_rng(1)
    for L in range(1, t.num_levels):
        Cc = t.classes_per_level[L]
        Cp = t.classes_per_level[L - 1]
        z = rng.standard_normal((2, 5, 7, Cc)).astype(np.float32) * 3
        p = rng.uniform(0.001, 1.0, (2, 5, 7, Cp)).astype(np.float32)
        q, pc = gated_grouped_softmax(z, p, t.parent_index[L], t.child_to_parent[L])

        # oracle groups: parents in level L-1 order with their children
        groups = [(pn, list(t.children[pn])) for pn in t.levels[L - 1]
                  if t.children[pn]]
        zt = torch.from_numpy(z).permute(0, 3, 1, 2)
        pt = torch.from_numpy(p).permute(0, 3, 1, 2)
        q_ref, pc_ref = _torch_grouped_softmax(zt, pt, groups, list(t.levels[L - 1]))
        np.testing.assert_allclose(
            np.asarray(q), q_ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(pc), pc_ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6
        )


def test_grouped_softmax_properties(default_tree):
    """Q sums to 1 within each group; composition preserves P_parent mass."""
    t = default_tree
    rng = np.random.default_rng(2)
    z = rng.standard_normal((3, 4, 4, 4)).astype(np.float32)
    p = rng.uniform(0, 1, (3, 4, 4, 4)).astype(np.float32)
    q, pc = gated_grouped_softmax(z, p, t.parent_index[1], t.child_to_parent[1])
    # single group (tooth): Q sums to 1 over the 4 children
    np.testing.assert_allclose(np.asarray(q).sum(-1), 1.0, rtol=1e-5)
    # sum of children == parent prob (restrictive consistency by construction)
    np.testing.assert_allclose(
        np.asarray(pc).sum(-1), p[..., 3], rtol=1e-5, atol=1e-6
    )


def test_grouped_kl_matches_reference_formula(extended_tree):
    """Oracle: the commented-out grouped_conditional_kl (losses.py:180-210) —
    per-group mean of Q*(logQ - log(1/g)), averaged over groups."""
    t = extended_tree
    L = 2  # two groups: alveolar->(upper,lower), tooth->(composite,healthy)
    rng = np.random.default_rng(3)
    Cc = t.classes_per_level[L]
    q = rng.uniform(0.01, 1.0, (2, 3, 3, Cc)).astype(np.float32)
    got = float(grouped_conditional_kl(q, t.child_to_parent[L]))

    qt = torch.from_numpy(q).permute(0, 3, 1, 2)
    kl, gcount, start = 0.0, 0, 0
    groups = [(pn, list(t.children[pn])) for pn in t.levels[L - 1] if t.children[pn]]
    for pname, chnames in groups:
        g = len(chnames)
        Q = qt[:, start:start + g].clamp_min(1e-8)
        U = torch.full_like(Q, 1.0 / g)
        kl = kl + (Q * (Q.log() - U.log())).mean()
        gcount += 1
        start += g
    want = float(kl / gcount)
    np.testing.assert_allclose(got, want, rtol=1e-5)
