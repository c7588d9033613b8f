from .hierarchical import (  # noqa: F401
    consistency_loss,
    hierarchical_loss,
    masked_cross_entropy,
    masked_soft_dice,
)
