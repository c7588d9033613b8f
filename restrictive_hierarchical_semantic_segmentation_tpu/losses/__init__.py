from .hierarchical import (  # noqa: F401
    consistency_loss,
    ohem_select,
    hierarchical_loss,
    masked_cross_entropy,
    masked_soft_dice,
)
