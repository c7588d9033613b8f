"""Grain loader: shapes, determinism, sharding, drop_last parity with
BatchLoader conventions."""
import glob

import numpy as np
import pytest

from restrictive_hierarchical_semantic_segmentation_tpu.data.grain_pipeline import (
    GrainLoader,
    grain_available,
)
from restrictive_hierarchical_semantic_segmentation_tpu.data.dataset import SegDataset
from restrictive_hierarchical_semantic_segmentation_tpu.data.synthetic import (
    write_synth_dataset,
)

pytestmark = pytest.mark.skipif(not grain_available(), reason="grain missing")


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain")
    write_synth_dataset(str(root), 6, size=80, seed=0)
    imgs = sorted(glob.glob(str(root / "images" / "*")))
    labs = sorted(glob.glob(str(root / "labels" / "*")))

    def make(augment=True):
        return SegDataset(imgs, labs, _tree(), 48, True, augment=augment)

    return make


def _tree():
    from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
        ClassTree,
    )

    return ClassTree.from_json("assets/class_tree_tl.json",
                               "assets/class_map.csv")


def test_grain_shapes_and_len(ds):
    dl = GrainLoader(ds(), 2, shuffle=True, drop_last=True, seed=1)
    assert len(dl) == 3
    batches = list(dl)
    assert len(batches) == 3
    x, y = batches[0]
    assert x.shape == (2, 48, 48, 3) and y.shape == (2, 48, 48, 8)
    assert set(np.unique(y)) <= {-1.0, 0.0, 1.0}


def test_grain_determinism_and_epoch_variation(ds):
    d = ds()
    dl = GrainLoader(d, 2, shuffle=True, drop_last=True, seed=5)
    dl.set_epoch(2)
    a = [x.copy() for x, _ in dl]
    dl.set_epoch(2)
    b = [x for x, _ in dl]
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    dl.set_epoch(3)
    c = next(iter(dl))[0]
    assert not np.array_equal(a[0], c)


def test_grain_sharding_partitions_data(ds):
    d = ds(augment=False)
    seen = []
    for idx in range(2):
        dl = GrainLoader(d, 1, shuffle=False, drop_last=False, seed=0,
                         shard_index=idx, shard_count=2)
        seen.append([x[0].sum() for x, _ in dl])
    assert len(seen[0]) == 3 and len(seen[1]) == 3
    # the two shards see disjoint samples
    assert not set(np.round(seen[0], 3)) & set(np.round(seen[1], 3))
