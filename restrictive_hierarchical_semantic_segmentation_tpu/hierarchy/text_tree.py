"""Indented-text class-tree parser — capability parity with the reference's
vestigial ``tree_util.py`` (imported at train.py:9 / losses.py:4 but never
called in the active path). Provided as a working utility: a plain-text tree

    background
    upper
    lower
    tooth
        pulp
        dentin
        enamel
        composite

parses to the same nested-dict form as the JSON assets, so text trees are a
drop-in alternative input to :class:`ClassTree`.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

__all__ = ["parse_text_tree", "dump_text_tree"]


def parse_text_tree(text: str) -> dict:
    """Indented text -> nested dict (tree_util.py:6-60 intent)."""
    root: Dict = {}
    stack: List[Tuple[int, Dict]] = [(-1, root)]
    for raw in text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("#"):
            continue
        indent = len(raw) - len(raw.lstrip())
        name = raw.strip()
        while stack and stack[-1][0] >= indent:
            stack.pop()
        parent = stack[-1][1]
        node: Dict = {}
        parent[name] = node
        stack.append((indent, node))
    return root


def dump_text_tree(tree: dict, indent: int = 0) -> str:
    out = []
    for k, v in tree.items():
        out.append(" " * indent + k)
        if isinstance(v, dict) and v:
            out.append(dump_text_tree(v, indent + 4))
    return "\n".join(out)
