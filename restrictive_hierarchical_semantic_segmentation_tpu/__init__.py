"""Restrictive Hierarchical Semantic Segmentation — TPU-native framework.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
Banksylel/Restrictive-Hierarchical-Semantic-Segmentation (a PyTorch research
codebase): hierarchy-restricted semantic segmentation with recurrent level-wise
prediction, FiLM top-down conditioning, restrictive (gated grouped-softmax)
output heads, probabilistic composition ``P_child = P_parent * Q_{child|parent}``,
ternary restrictive supervision, and the full train / eval / agreement tooling.

Import alias: ``import rhss_tpu`` (see the top-level ``rhss_tpu.py`` shim).
"""

__version__ = "0.1.0"

from .hierarchy.tree import ClassTree, load_class_map  # noqa: F401
