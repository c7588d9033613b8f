from .dataset import SegDataset  # noqa: F401
from .loader import BatchLoader, prefetch_to_device, split_ids  # noqa: F401
from .target_factory import leaf_masks, node_masks, ternary_encode  # noqa: F401
