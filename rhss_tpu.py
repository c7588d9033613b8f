"""Ergonomic alias: ``import rhss_tpu`` ==
``import restrictive_hierarchical_semantic_segmentation_tpu``."""
import sys

import restrictive_hierarchical_semantic_segmentation_tpu as _pkg

sys.modules[__name__] = _pkg
