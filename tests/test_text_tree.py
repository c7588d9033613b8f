"""Indented-text tree parser (tree_util.py capability equivalent)."""
from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.text_tree import (
    dump_text_tree,
    parse_text_tree,
)
from restrictive_hierarchical_semantic_segmentation_tpu.hierarchy.tree import (
    ClassTree,
)

TEXT = """
background
upper
lower
tooth
    pulp
    dentin
    enamel
    composite
"""


def test_parse_matches_json_tree(default_tree):
    parsed = parse_text_tree(TEXT)
    assert parsed == default_tree.tree


def test_round_trip():
    parsed = parse_text_tree(TEXT)
    assert parse_text_tree(dump_text_tree(parsed)) == parsed


def test_text_tree_feeds_classtree(default_tree):
    t = ClassTree.from_dict(parse_text_tree(TEXT), default_tree.pixel_value)
    assert t.levels == default_tree.levels
    assert t.leaf_names == default_tree.leaf_names
