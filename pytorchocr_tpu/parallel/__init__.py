from .mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
    shard_or_replicate,
)
from .shardings import DEFAULT_TP_RULES, param_shardings, shard_params  # noqa: F401
