"""Device-mesh parallelism: mesh construction, sharding helpers, collectives.

The reference has no real multi-device training (vestigial DDP hooks only,
SURVEY.md §2c); this package provides the TPU-native mapping: data-parallel
ray sharding over ICI for NeRF training, tensor/FSDP sharding for diffusion.
"""

from signerf_tpu.parallel.mesh import (
    get_mesh,
    mesh_from_spec,
    production_mesh,
    replicate,
    shard_along,
)

__all__ = [
    "get_mesh",
    "mesh_from_spec",
    "production_mesh",
    "replicate",
    "shard_along",
]
