"""Hierarchy core: a single immutable ``ClassTree`` replacing the reference's five
scattered tree walkers.

The reference (Banksylel/Restrictive-Hierarchical-Semantic-Segmentation) re-derives
hierarchy structure in five places with subtly-shared conventions:

* ``Models/models.py:38-98``   (``build_hierarchy_indices`` / ``get_level_classes``)
* ``train.py:86-106``          (``get_classes`` — per-level class counts)
* ``predictEval.py:37-82``     (``children_map`` / ``bfs_order`` / ``levels_bfs`` /
  ``descendant_leaves``)
* ``Data/dataset.py:41-124``   (post-order mask factory + level-order emission)
* ``tree_util.py`` (vestigial, never called)

This module precomputes every index table those walkers produce, once, as plain
numpy arrays, so everything downstream of it (model heads, losses, metrics, the
target factory) is pure gather/segment arithmetic with **static shapes** — the
jit-friendly TPU form.  No name lookups ever happen inside a traced function.

Canonical channel conventions (proved equivalent to the reference's in
``tests/test_tree.py``):

* hierarchical target layout = levels concatenated in BFS order
  (``dataset.py:69-124`` emits level-order over the forest, which equals the
  per-level orders of ``models.py:82-98`` concatenated);
* per-level head channel order = BFS order of that level, which equals the
  reference's parent-group concatenation (``models.py:229-238``);
* flat (leaf) layout = BFS order filtered to leaves (``dataset.py:97-118``).
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["ClassTree", "load_class_map"]


def load_class_map(path_or_rows) -> Dict[str, Optional[int]]:
    """Load a ``class_map.csv`` (columns ``class_id,class_name,pixel_val``) into
    ``{class_name: pixel_val or None}``.

    Mirrors the reference's ``pd.read_csv(class_map)`` usage (train.py:407) but
    without a pandas dependency in the core. ``pixel_val`` of ``None``/``NaN``
    means the class has no direct pixel encoding (it is a parent whose mask is
    the union of its descendants).
    """
    if isinstance(path_or_rows, dict):
        return {str(k): (None if v is None else int(v)) for k, v in path_or_rows.items()}
    rows: List[Tuple[str, Optional[int]]] = []
    with open(path_or_rows, "r", encoding="utf-8-sig") as f:
        header = f.readline().strip().split(",")
        name_col = header.index("class_name")
        pix_col = header.index("pixel_val")
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(",")
            raw = parts[pix_col].strip()
            pix = None if raw in ("None", "none", "", "nan", "NaN") else int(float(raw))
            rows.append((parts[name_col].strip(), pix))
    return dict(rows)


@dataclass(frozen=True, eq=False)
class ClassTree:
    """Immutable, fully-indexed class hierarchy.

    Build with :meth:`from_json` / :meth:`from_dict`. All arrays are numpy and
    static — safe to close over in jitted functions. ``eq=False``: instances
    compare/hash by identity so a ClassTree can be a static field of a Flax
    module (numpy members make value-equality ill-defined).
    """

    tree: dict
    pixel_value: Dict[str, Optional[int]]

    # --- names ---------------------------------------------------------------
    names: Tuple[str, ...]                       # BFS over forest (canonical order)
    levels: Tuple[Tuple[str, ...], ...]          # names per depth, BFS within level
    leaf_names: Tuple[str, ...]                  # BFS order filtered to leaves
    parent_name: Dict[str, Optional[str]]
    children: Dict[str, Tuple[str, ...]]

    # --- integer machinery ---------------------------------------------------
    num_levels: int
    classes_per_level: Tuple[int, ...]           # all nodes per level (hier targets/heads)
    leaves_per_level: Tuple[int, ...]            # leaves per level (flat head size)
    level_slices: Tuple[Tuple[int, int], ...]    # [start, stop) into concat hier layout
    # For every level L >= 1: channel -> index of its parent within level L-1.
    parent_index: Tuple[np.ndarray, ...]         # len == num_levels, entry 0 is empty
    # For every level L >= 1: one-hot (C_L, C_{L-1}) float32 assignment matrix
    # A[c, p] == 1 iff parent of child-channel c is parent-channel p. Grouped
    # softmax/segment-sums become tiny matmuls with these (MXU/VPU friendly).
    child_to_parent: Tuple[np.ndarray, ...]
    # Parents (per level L-1) that actually have children at level L.
    parents_with_children: Tuple[np.ndarray, ...]  # int indices into level L-1
    # Leaf layout
    leaf_index: Dict[str, int]                   # leaf name -> flat channel
    leaf_level: np.ndarray                       # flat channel -> depth
    # Per-leaf-channel position within its level's *full* channel list
    leaf_pos_in_level: np.ndarray
    # Eval-time flat->hierarchy reconstruction (predictEval.py:85-129):
    parent_names_bfs: Tuple[str, ...]            # BFS order filtered to parents
    # For each parent (BFS order): sorted flat-leaf channels of its descendants
    descendant_leaves: Tuple[Tuple[int, ...], ...]
    # Pixel-value LUT: lut[v] == flat leaf channel of pixel value v, else -1
    pixel_lut: np.ndarray = field(repr=False, default=None)

    # ------------------------------------------------------------------ build
    @staticmethod
    def from_json(tree_path: str, class_map) -> "ClassTree":
        with open(tree_path) as f:
            tree = json.load(f)
        if isinstance(class_map, str):
            class_map = load_class_map(class_map)
        return ClassTree.from_dict(tree, class_map)

    @staticmethod
    def from_dict(tree: dict, class_map: Dict[str, Optional[int]]) -> "ClassTree":
        # BFS over the forest — reference predictEval.py:50-59 / dataset.py:69-86.
        names: List[str] = []
        levels: List[List[str]] = []
        parent_name: Dict[str, Optional[str]] = {}
        children: Dict[str, Tuple[str, ...]] = {}
        queue: List[Tuple[str, dict, int, Optional[str]]] = [
            (k, v, 0, None) for k, v in tree.items()
        ]
        while queue:
            name, subtree, depth, parent = queue.pop(0)
            names.append(name)
            while len(levels) <= depth:
                levels.append([])
            levels[depth].append(name)
            parent_name[name] = parent
            kids = list(subtree.keys()) if isinstance(subtree, dict) else []
            children[name] = tuple(kids)
            for cn in kids:
                queue.append((cn, subtree[cn], depth + 1, name))

        num_levels = len(levels)
        leaf_names = [n for n in names if not children[n]]
        classes_per_level = tuple(len(l) for l in levels)
        leaves_per_level = tuple(
            sum(1 for n in l if not children[n]) for l in levels
        )
        starts = np.concatenate([[0], np.cumsum(classes_per_level)])
        level_slices = tuple(
            (int(starts[i]), int(starts[i + 1])) for i in range(num_levels)
        )

        parent_index: List[np.ndarray] = [np.zeros((0,), np.int32)]
        child_to_parent: List[np.ndarray] = [np.zeros((0, 0), np.float32)]
        parents_with_children: List[np.ndarray] = [np.zeros((0,), np.int32)]
        for L in range(1, num_levels):
            prev = levels[L - 1]
            cur = levels[L]
            pidx = np.array([prev.index(parent_name[c]) for c in cur], np.int32)
            A = np.zeros((len(cur), len(prev)), np.float32)
            A[np.arange(len(cur)), pidx] = 1.0
            parent_index.append(pidx)
            child_to_parent.append(A)
            parents_with_children.append(
                np.array(sorted({int(p) for p in pidx}), np.int32)
            )

        leaf_index = {n: i for i, n in enumerate(leaf_names)}
        depth_of = {n: d for d, lvl in enumerate(levels) for n in lvl}
        leaf_level = np.array([depth_of[n] for n in leaf_names], np.int32)
        leaf_pos_in_level = np.array(
            [levels[depth_of[n]].index(n) for n in leaf_names], np.int32
        )

        parent_names_bfs = tuple(n for n in names if children[n])

        def _desc_leaves(n: str) -> List[int]:
            if not children[n]:
                return [leaf_index[n]]
            out: List[int] = []
            for c in children[n]:
                out.extend(_desc_leaves(c))
            return out

        descendant_leaves = tuple(
            tuple(sorted(set(_desc_leaves(p)))) for p in parent_names_bfs
        )

        # Pixel LUT for the target factory (dataset.py:41-68 exact-name matches).
        lut = np.full((256,), -1, np.int32)
        for n in leaf_names:
            if n not in class_map:
                raise KeyError(f"Class '{n}' not found in class_map.")
            pv = class_map[n]
            if pv is None:
                raise ValueError(
                    f"Leaf class '{n}' has no pixel value in the class map."
                )
            lut[int(pv)] = leaf_index[n]

        return ClassTree(
            tree=tree,
            pixel_value=dict(class_map),
            names=tuple(names),
            levels=tuple(tuple(l) for l in levels),
            leaf_names=tuple(leaf_names),
            parent_name=parent_name,
            children=children,
            num_levels=num_levels,
            classes_per_level=classes_per_level,
            leaves_per_level=leaves_per_level,
            level_slices=level_slices,
            parent_index=tuple(parent_index),
            child_to_parent=tuple(child_to_parent),
            parents_with_children=tuple(parents_with_children),
            leaf_index=leaf_index,
            leaf_level=leaf_level,
            leaf_pos_in_level=leaf_pos_in_level,
            parent_names_bfs=parent_names_bfs,
            descendant_leaves=descendant_leaves,
            pixel_lut=lut,
        )

    # ------------------------------------------------------------------ views
    @property
    def num_classes(self) -> int:
        """Total hierarchical channels (== sum of classes_per_level)."""
        return int(sum(self.classes_per_level))

    @property
    def num_leaves(self) -> int:
        return len(self.leaf_names)

    def head_sizes(self, hierarchical: bool) -> Tuple[int, ...]:
        """Output channels per level head.

        Hierarchical: reference ``get_classes(tree, full=True)`` (train.py:86-106).
        Flat: a single head over all leaves (models.py:213-216).
        """
        if hierarchical:
            return self.classes_per_level
        return (self.num_leaves,)

    def level_of_channel(self) -> np.ndarray:
        """channel (concat layout) -> level index."""
        out = np.zeros((self.num_classes,), np.int32)
        for L, (a, b) in enumerate(self.level_slices):
            out[a:b] = L
        return out

    def split_levels(self, x, axis: int = -1) -> List:
        """Split a concatenated hierarchical channel axis into per-level arrays
        (reference train.py:185-193)."""
        out = []
        for a, b in self.level_slices:
            idx = [slice(None)] * (x.ndim if hasattr(x, "ndim") else 4)
            idx[axis] = slice(a, b)
            out.append(x[tuple(idx)])
        return out

    def channel_index(self, name: str) -> int:
        """Index of `name` in the concatenated hierarchical layout."""
        d = next(L for L, lvl in enumerate(self.levels) if name in lvl)
        return self.level_slices[d][0] + self.levels[d].index(name)
