"""ClassTree unit tests — checks every index table against the reference's
conventions (models.py:38-98, train.py:86-106, predictEval.py:37-82,
dataset.py:69-124), re-derived independently here."""
import numpy as np


def test_default_tree_levels(default_tree):
    t = default_tree
    assert t.num_levels == 2
    assert t.levels == (("background", "upper", "lower", "tooth"),
                        ("pulp", "dentin", "enamel", "composite"))
    # get_classes(full=True) per reference train.py:86-106
    assert t.classes_per_level == (4, 4)
    # get_classes(full=False): leaves per level
    assert t.leaves_per_level == (3, 4)
    assert t.num_classes == 8
    assert t.num_leaves == 7
    # level-order == BFS == concat target layout (dataset.py:69-124)
    assert t.names == ("background", "upper", "lower", "tooth",
                       "pulp", "dentin", "enamel", "composite")
    assert t.level_slices == ((0, 4), (4, 8))


def test_default_tree_parent_machinery(default_tree):
    t = default_tree
    # all four children of tooth (index 3 at level 0)
    np.testing.assert_array_equal(t.parent_index[1], [3, 3, 3, 3])
    A = t.child_to_parent[1]
    assert A.shape == (4, 4)
    np.testing.assert_array_equal(A.sum(axis=1), np.ones(4))
    np.testing.assert_array_equal(A[:, 3], np.ones(4))
    np.testing.assert_array_equal(t.parents_with_children[1], [3])


def test_default_tree_leaves(default_tree):
    t = default_tree
    # flat channel order: BFS filtered to leaves (dataset.py:97-118)
    assert t.leaf_names == ("background", "upper", "lower",
                            "pulp", "dentin", "enamel", "composite")
    assert t.leaf_index["composite"] == 6
    np.testing.assert_array_equal(t.leaf_level, [0, 0, 0, 1, 1, 1, 1])
    np.testing.assert_array_equal(t.leaf_pos_in_level, [0, 1, 2, 0, 1, 2, 3])
    # pixel LUT (class_map.csv values)
    assert t.pixel_lut[0] == 0        # background
    assert t.pixel_lut[212] == 1      # upper
    assert t.pixel_lut[255] == 2      # lower
    assert t.pixel_lut[127] == 3      # pulp
    assert t.pixel_lut[170] == 4      # dentin
    assert t.pixel_lut[85] == 5       # enamel
    assert t.pixel_lut[42] == 6       # composite
    assert (t.pixel_lut >= 0).sum() == 7


def test_default_tree_flat_reconstruction_tables(default_tree):
    t = default_tree
    # predictEval.py:85-129 — parents and their descendant leaf channels
    assert t.parent_names_bfs == ("tooth",)
    assert t.descendant_leaves == ((3, 4, 5, 6),)


def test_extended_tree(extended_tree):
    t = extended_tree
    assert t.num_levels == 4
    assert t.classes_per_level == (2, 2, 4, 3)
    assert t.levels[1] == ("alveolar", "tooth")
    assert t.levels[2] == ("upper", "lower", "composite", "healthy")
    assert t.levels[3] == ("pulp", "dentin", "enamel")
    assert t.leaf_names == ("background", "upper", "lower", "composite",
                            "pulp", "dentin", "enamel")
    np.testing.assert_array_equal(t.parent_index[1], [1, 1])
    np.testing.assert_array_equal(t.parent_index[2], [0, 0, 1, 1])
    np.testing.assert_array_equal(t.parent_index[3], [3, 3, 3])
    np.testing.assert_array_equal(t.parents_with_children[2], [0, 1])
    np.testing.assert_array_equal(t.parents_with_children[3], [3])
    assert t.parent_names_bfs == ("tooth+alveolar", "alveolar", "tooth", "healthy")
    # tooth+alveolar spans every non-background leaf
    assert t.descendant_leaves[0] == (1, 2, 3, 4, 5, 6)
    assert t.descendant_leaves[3] == (4, 5, 6)  # healthy -> pulp,dentin,enamel


def test_head_sizes_and_split(default_tree):
    t = default_tree
    assert t.head_sizes(hierarchical=True) == (4, 4)
    assert t.head_sizes(hierarchical=False) == (7,)
    x = np.arange(2 * 8 * 3 * 3).reshape(2, 3, 3, 8)  # NHWC
    parts = t.split_levels(x, axis=-1)
    assert [p.shape[-1] for p in parts] == [4, 4]
    np.testing.assert_array_equal(np.concatenate(parts, axis=-1), x)
    assert t.channel_index("tooth") == 3
    assert t.channel_index("composite") == 7
