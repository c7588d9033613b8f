"""Data pipeline tests: target factory invariants, ternary encoding, dataset
round-trips on synthetic TL-pano data, loader determinism."""
import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.data.loader import (
    BatchLoader,
    split_ids,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    synth_sample,
    write_synth_dataset,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.target_factory import (
    leaf_masks,
    node_masks,
    ternary_encode,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import SegDataset


def test_leaf_masks_partition(default_tree):
    rng = np.random.default_rng(0)
    _, mask = synth_sample(rng, 64)
    lm = leaf_masks(mask, default_tree)
    assert lm.shape == (64, 64, 7)
    # leaves are disjoint and cover everything (background catches the rest)
    assert (lm.sum(-1) == 1).all()
    # channel k is exactly the pixels with that class's pixel value
    assert (lm[..., 2] == (mask == 255)).all()  # lower
    assert (lm[..., 5] == (mask == 85)).all()   # enamel


def test_synth_sample_hard_mode(default_tree):
    """Hard mode (the accuracy-table dataset, tools/make_synth_tlpano.py)
    changes the IMAGE only: class masks stay valid class_map codes, and the
    background/jaw regions gain blobs with tooth-interior luminances so that
    fine-class appearance is ambiguous without parent context."""
    rng = np.random.default_rng(7)
    img_e, mask_e = synth_sample(rng, 128, hard=False)
    rng = np.random.default_rng(7)
    img_h, mask_h = synth_sample(rng, 128, hard=True)
    # valid pixel codes only, both modes
    codes = {0, 42, 85, 127, 170, 212, 255}
    assert set(np.unique(mask_h)) <= codes
    assert set(np.unique(mask_e)) <= codes
    # hard mode must put tooth-interior-like bright pixels OUTSIDE the tooth
    # classes (the easy render keeps background near 0 and jaws near 90-110)
    outside = ~np.isin(mask_h, (85, 170, 127, 42))
    assert (img_h[outside] > 140).sum() > (img_e[~np.isin(
        mask_e, (85, 170, 127, 42))] > 140).sum()
    # distractors never flip mask labels
    lm = leaf_masks(mask_h, default_tree)
    assert (lm.sum(-1) == 1).all()


def test_node_masks_parent_is_union(default_tree):
    rng = np.random.default_rng(1)
    _, mask = synth_sample(rng, 64)
    nm = node_masks(mask, default_tree)
    assert nm.shape == (64, 64, 8)
    # tooth (ch 3) == union of pulp/dentin/enamel/composite (chs 4..7)
    np.testing.assert_array_equal(nm[..., 3], nm[..., 4:].max(-1))
    # level-0 channels equal the leaf channels for leaf nodes
    lm = leaf_masks(mask, default_tree)
    np.testing.assert_array_equal(nm[..., 0], lm[..., 0])
    np.testing.assert_array_equal(nm[..., 1], lm[..., 1])


def test_ternary_encode_semantics(default_tree):
    rng = np.random.default_rng(2)
    _, mask = synth_sample(rng, 64)
    binary = node_masks(mask, default_tree).astype(np.float32)
    tern = ternary_encode(binary, default_tree)
    # roots (level 0) unchanged 0/1
    assert set(np.unique(tern[..., :4])) <= {0.0, 1.0}
    # children: 1 on class, 0 inside tooth w/o class, -1 outside tooth
    tooth = binary[..., 3] > 0
    for c in range(4, 8):
        ch = tern[..., c]
        assert ((ch == -1) == ~tooth).all()
        assert ((ch == 1) == (binary[..., c] > 0)).all()
    # invariant: each -1 region is identical across siblings
    np.testing.assert_array_equal(tern[..., 4] == -1, tern[..., 7] == -1)


def test_ternary_encode_extended(extended_tree):
    rng = np.random.default_rng(3)
    _, mask = synth_sample(rng, 64)
    binary = node_masks(mask, extended_tree).astype(np.float32)
    tern = ternary_encode(binary, extended_tree)
    # pulp (level 3) is -1 exactly outside healthy (its direct parent)
    healthy = binary[..., extended_tree.channel_index("healthy")] > 0
    pulp = tern[..., extended_tree.channel_index("pulp")]
    assert ((pulp == -1) == ~healthy).all()


@pytest.mark.parametrize("hierarchical", [True, False])
def test_dataset_end_to_end(tmp_path, default_tree, hierarchical):
    write_synth_dataset(str(tmp_path), 3, size=80, seed=0)
    import glob
    imgs = sorted(glob.glob(str(tmp_path / "images" / "*")))
    labs = sorted(glob.glob(str(tmp_path / "labels" / "*")))
    ds = SegDataset(imgs, labs, default_tree, img_size=64,
                    hierarchical=hierarchical, augment=True)
    rng = np.random.default_rng(7)
    x, y = ds.__getitem__(0, rng)
    assert x.shape == (64, 64, 3) and x.dtype == np.float32
    c = 8 if hierarchical else 7
    assert y.shape == (64, 64, c)
    vals = set(np.unique(y))
    if hierarchical:
        assert vals <= {-1.0, 0.0, 1.0}
        assert -1.0 in vals  # restrictive region exists
    else:
        assert vals <= {0.0, 1.0}
    # image normalized to [-1, 1] (mean .5 / std .5)
    assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6

    # eval mode is deterministic
    ds_eval = SegDataset(imgs, labs, default_tree, img_size=64,
                         hierarchical=hierarchical, augment=False)
    x1, y1 = ds_eval.__getitem__(1, np.random.default_rng(0))
    x2, y2 = ds_eval.__getitem__(1, np.random.default_rng(99))
    np.testing.assert_array_equal(x1, x2)
    np.testing.assert_array_equal(y1, y2)


def test_batch_loader_shapes_and_determinism(tmp_path, default_tree):
    write_synth_dataset(str(tmp_path), 5, size=80, seed=1)
    import glob
    imgs = sorted(glob.glob(str(tmp_path / "images" / "*")))
    labs = sorted(glob.glob(str(tmp_path / "labels" / "*")))
    ds = SegDataset(imgs, labs, default_tree, img_size=48,
                    hierarchical=True, augment=True)
    dl = BatchLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=5)
    dl.set_epoch(3)
    batches1 = [(x.copy(), y.copy()) for x, y in dl]
    assert len(batches1) == 2  # 5 // 2 with drop_last
    assert batches1[0][0].shape == (2, 48, 48, 3)
    assert batches1[0][1].shape == (2, 48, 48, 8)
    dl.set_epoch(3)
    batches2 = list(dl)
    for (x1, y1), (x2, y2) in zip(batches1, batches2):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    dl.set_epoch(4)  # different epoch -> different augs/order
    b3 = next(iter(dl))
    assert not np.array_equal(b3[0], batches1[0][0])


def test_split_ids_matches_reference_fractions():
    tr, te, va = split_ids(100, has_val=False, has_test=False, test_remove=False)
    assert len(va) == 10 and len(te) == 10 and len(tr) == 80
    assert set(tr) | set(te) | set(va) == set(range(100))
    tr2, te2, va2 = split_ids(100, has_val=True, has_test=False, test_remove=True)
    assert te2 is None and va2 is None and len(tr2) == 100


def test_batch_loader_drop_last_false_and_single_worker(tmp_path, default_tree):
    write_synth_dataset(str(tmp_path), 3, size=80, seed=9)
    import glob
    imgs = sorted(glob.glob(str(tmp_path / "images" / "*")))
    labs = sorted(glob.glob(str(tmp_path / "labels" / "*")))
    ds = SegDataset(imgs, labs, default_tree, 32, True, augment=False)
    dl = BatchLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                     num_workers=1)
    batches = list(dl)
    assert len(dl) == 2 and len(batches) == 2
    assert batches[0][0].shape[0] == 2
    assert batches[1][0].shape[0] == 1  # ragged final batch preserved


def test_compact_host_formats_bit_identical(tmp_path, default_tree):
    """int8 ternary targets + single-channel gray images (host_compact) carry
    exactly the f32/3ch values — the jitted steps' device-side decode
    (train/steps.py _device_decode) restores the reference layout."""
    from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import (
        SegDataset,
    )

    write_synth_dataset(str(tmp_path), 3, size=80, seed=7)
    import glob as g
    imgs = sorted(g.glob(str(tmp_path / "fold_1" / "train" / "images" / "*")))
    labs = sorted(g.glob(str(tmp_path / "fold_1" / "train" / "labels" / "*")))
    ref = SegDataset(imgs, labs, default_tree, 48, True, augment=True)
    cmp = SegDataset(imgs, labs, default_tree, 48, True, augment=True,
                     target_dtype=np.int8, emit_gray=True)
    for k in range(len(imgs)):
        xf, yf = ref.__getitem__(k, np.random.default_rng(100 + k))
        xi, yi = cmp.__getitem__(k, np.random.default_rng(100 + k))
        assert yi.dtype == np.int8
        np.testing.assert_array_equal(yf, yi.astype(np.float32))
        x3 = (np.broadcast_to(xi, xi.shape[:-1] + (3,))
              if xi.shape[-1] == 1 else xi)
        np.testing.assert_array_equal(xf, x3)

    # the numpy fallback honors the dtype too
    cmp_np = SegDataset(imgs, labs, default_tree, 48, True, augment=True,
                        target_dtype=np.int8, emit_gray=True,
                        use_native=False)
    for k in range(len(imgs)):
        xf, yf = ref.__getitem__(k, np.random.default_rng(100 + k))
        xi, yi = cmp_np.__getitem__(k, np.random.default_rng(100 + k))
        assert yi.dtype == np.int8
        np.testing.assert_array_equal(yf, yi.astype(np.float32))


def test_device_decode_roundtrip(default_tree):
    import jax.numpy as jnp

    from restrictive_hierarchical_semantic_segmentation_tpu.train.steps import (
        _device_decode,
    )

    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    y8 = rng.integers(-1, 2, (2, 8, 8, 8)).astype(np.int8)
    xd, yd = _device_decode(jnp.asarray(x1), jnp.asarray(y8))
    assert xd.shape == (2, 8, 8, 3) and yd.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(yd), y8.astype(np.float32))
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(xd[..., c]), x1[..., 0])


def test_process_workers_bit_identical_to_threads(tmp_path, default_tree):
    """worker_mode="process": spawn-context OS workers with the accelerator
    env scrubbed (data/loader.py _make_process_pool) — the reference's
    DataLoader num_workers counterpart (dataloaders.py:43-46). Per-sample
    seeding is (seed, epoch, index)-derived on both paths, so process and
    thread modes must produce bit-identical batches."""
    write_synth_dataset(str(tmp_path), 4, size=80, seed=2)
    import glob
    imgs = sorted(glob.glob(str(tmp_path / "images" / "*")))
    labs = sorted(glob.glob(str(tmp_path / "labels" / "*")))
    ds = SegDataset(imgs, labs, default_tree, img_size=48,
                    hierarchical=True, augment=True)
    dl_t = BatchLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=5)
    dl_p = BatchLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=5,
                       num_workers=2, worker_mode="process")
    try:
        dl_t.set_epoch(1)
        dl_p.set_epoch(1)
        got_t = list(dl_t)
        got_p = list(dl_p)
        assert len(got_t) == len(got_p) == 2
        for (xt, yt), (xp, yp) in zip(got_t, got_p):
            np.testing.assert_array_equal(xt, xp)
            np.testing.assert_array_equal(yt, yp)
    finally:
        dl_t.close()
        dl_p.close()
