from .tree import ClassTree, load_class_map  # noqa: F401
from .text_tree import parse_text_tree, dump_text_tree  # noqa: F401
