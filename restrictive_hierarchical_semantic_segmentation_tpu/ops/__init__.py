from .resize import resize_bilinear, upsample2x_align_corners  # noqa: F401
from .restrictive import (  # noqa: F401
    compose_children,
    gated_grouped_softmax,
    grouped_conditional_kl,
)
from .fused_bn_act import (  # noqa: F401
    batch_norm_act,
    bn_stats,
    fused_bn_act,
    fused_scale_bias_act,
)
