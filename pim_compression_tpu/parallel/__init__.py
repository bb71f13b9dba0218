"""SPMD decomposition: mesh construction and block sharding."""

from pim_compression_tpu.parallel.mesh import (  # noqa: F401
    block_sharding,
    get_mesh,
    pad_to_multiple,
    replicated_sharding,
)
