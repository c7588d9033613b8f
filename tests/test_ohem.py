"""OHEM hard-example mining tests (upstream HRNet-Semantic-Seg semantics —
the reference ships OHEM only as dead yacs config keys, SURVEY §2.19)."""
import numpy as np
import jax.numpy as jnp

from restrictive_hierarchical_semantic_segmentation_tpu.losses.hierarchical import (
    hierarchical_loss,
    masked_cross_entropy,
    ohem_select,
)


def _softmax(z):
    e = np.exp(z - z.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_ohem_select_oracle():
    rng = np.random.default_rng(0)
    z = rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 3
    cls = rng.integers(0, 4, (2, 8, 8))
    t = np.eye(4, dtype=np.float32)[cls]
    keep = np.asarray(ohem_select(z, t, thres=0.7, min_kept=10))

    probs = _softmax(z)
    p_true = np.take_along_axis(probs, cls[..., None], -1)[..., 0]
    for b in range(2):
        kth = np.sort(p_true[b].ravel())[10 - 1]
        t_eff = max(kth, 0.7)
        want = p_true[b] <= t_eff
        np.testing.assert_array_equal(keep[b], want)
        assert keep[b].sum() >= 10


def test_ohem_min_kept_floor():
    """Even when every pixel is easy (p_true ~ 1), min_kept survive."""
    z = np.zeros((1, 4, 4, 3), np.float32)
    z[..., 0] = 50.0  # class 0 certain
    t = np.zeros((1, 4, 4, 3), np.float32)
    t[..., 0] = 1.0  # and correct
    keep = np.asarray(ohem_select(z, t, thres=0.9, min_kept=5))
    assert keep.sum() >= 5


def test_ohem_ignores_unlabeled_pixels():
    z = np.zeros((1, 4, 4, 3), np.float32)
    t = np.full((1, 4, 4, 3), -1.0, np.float32)
    t[0, 0, 0] = [1, 0, 0]
    keep = np.asarray(ohem_select(z, t, thres=0.9, min_kept=16))
    assert keep[0, 0, 0]
    assert keep.sum() == 1  # only the labeled pixel is eligible


def test_ohem_in_hierarchical_loss():
    rng = np.random.default_rng(1)
    z = [rng.standard_normal((2, 8, 8, 4)).astype(np.float32)]
    cls = rng.integers(0, 4, (2, 8, 8))
    t = [np.eye(4, dtype=np.float32)[cls]]
    full, _ = hierarchical_loss(z, t)
    mined, _ = hierarchical_loss(z, t, ohem=(0.5, 4))
    # mining keeps only hard pixels -> CE over kept set >= plain mean CE
    assert float(mined) >= float(full) - 1e-6

    # equivalent by construction: OHEM == CE with de-selected pixels set to -1
    keep = np.asarray(ohem_select(z[0], t[0], 0.5, 4))
    t_masked = np.where(keep[..., None], t[0], -1.0)
    want = float(masked_cross_entropy(z[0], t_masked))
    # hierarchical_loss adds the dice term; subtract it via the full pipeline
    from restrictive_hierarchical_semantic_segmentation_tpu.losses.hierarchical import (
        masked_soft_dice,
    )

    dsum, dcnt = masked_soft_dice(z[0], t[0])
    dice = float(dsum) / max(float(dcnt), 1.0)
    np.testing.assert_allclose(float(mined), want + dice, rtol=1e-5)
