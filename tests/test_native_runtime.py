"""Native C++ sample-factory parity vs the pure-numpy path."""
import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.data import native
from restrictive_hierarchical_semantic_segmentation_tpu.data import transforms as T
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    synth_sample,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.target_factory import (
    node_masks,
    leaf_masks,
    ternary_encode,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native runtime unavailable (no g++?)"
)


def numpy_reference(mask, tree, size, hier, hflip=False, aff=None):
    y = (node_masks(mask, tree) if hier else leaf_masks(mask, tree)).astype(
        np.float32
    )
    y = T.resize_bilinear_np(y, (size, size))
    if hflip:
        y = T.hflip(y)
    if aff is not None:
        chans = []
        for c in range(y.shape[-1]):
            fill = float(y[..., c].max()) if c == 0 else -1.0
            yc = T.affine_nearest(np.ascontiguousarray(y[..., c]), aff, fill)
            chans.append(yc[..., 0] if yc.ndim == 3 else yc)
        y = np.stack(chans, axis=-1)
    y = (y >= 0.5).astype(np.float32)
    if hier:
        y = ternary_encode(y, tree)
    return y


@pytest.mark.parametrize("hier", [True, False])
@pytest.mark.parametrize("hflip", [False, True])
def test_native_matches_numpy_no_affine(default_tree, hier, hflip):
    rng = np.random.default_rng(0)
    _, mask = synth_sample(rng, 96)
    tables = native.ChannelTables(default_tree, hier)
    got = native.make_target_native(mask, tables, 64, hflip=hflip)
    want = numpy_reference(mask, default_tree, 64, hier, hflip=hflip)
    # bilinear implementations (cv2 fixed-point vs exact float) may disagree
    # on threshold-boundary pixels; require >= 99.5% exact agreement
    agree = (got == want).mean()
    assert agree > 0.995, agree


def test_native_matches_numpy_with_affine(default_tree):
    rng = np.random.default_rng(1)
    _, mask = synth_sample(rng, 96)
    aff = T.sample_affine(np.random.default_rng(7))
    m = T.affine_forward_matrix(aff, 64, 64)
    tables = native.ChannelTables(default_tree, True)
    got = native.make_target_native(mask, tables, 64, hflip=False,
                                    affine_matrix=m)
    want = numpy_reference(mask, default_tree, 64, True, aff=aff)
    agree = (got == want).mean()
    assert agree > 0.99, agree
    # ternary values only
    assert set(np.unique(got)) <= {-1.0, 0.0, 1.0}


def test_native_extended_tree(extended_tree):
    rng = np.random.default_rng(2)
    _, mask = synth_sample(rng, 96)
    tables = native.ChannelTables(extended_tree, True)
    got = native.make_target_native(mask, tables, 48, hflip=False)
    want = numpy_reference(mask, extended_tree, 48, True)
    assert (got == want).mean() > 0.995


def test_dataset_uses_native_consistently(tmp_path, default_tree):
    """Seed-for-seed identity between native-enabled and numpy-only datasets
    (modulo threshold-boundary pixels)."""
    from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import (
        SegDataset,
    )
    from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
        write_synth_dataset,
    )
    import glob

    write_synth_dataset(str(tmp_path), 2, size=96, seed=3)
    imgs = sorted(glob.glob(str(tmp_path / "images" / "*")))
    labs = sorted(glob.glob(str(tmp_path / "labels" / "*")))
    ds_n = SegDataset(imgs, labs, default_tree, 64, True, augment=True,
                      use_native=True)
    ds_p = SegDataset(imgs, labs, default_tree, 64, True, augment=True,
                      use_native=False)
    xn, yn = ds_n.__getitem__(0, np.random.default_rng(42))
    xp, yp = ds_p.__getitem__(0, np.random.default_rng(42))
    np.testing.assert_array_equal(xn, xp)  # image path identical
    assert (yn == yp).mean() > 0.99
