from .segmentation import (  # noqa: F401
    MetricAccumulator,
    level_confusion_matrices,
    metrics_from_confusion,
)
