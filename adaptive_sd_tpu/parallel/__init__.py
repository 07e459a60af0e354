from .mesh import (
    AXIS_DCN,
    AXIS_DP,
    AXIS_TP,
    TierPlacement,
    build_mesh,
    build_multihost_mesh,
    plan_tier_placements,
    virtual_cpu_devices,
)
from .sharding import (
    batch_sharding,
    cache_specs,
    param_specs,
    replicated,
    shard_cache,
    shard_params,
)

__all__ = [name for name in dir() if not name.startswith("_")]
