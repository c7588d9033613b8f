from .mesh import (  # noqa: F401
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    init_distributed,
    make_mesh,
    replicated,
)
