from topomap_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    batch_sharding_2d,
    replicated,
    replicate,
    shard_batch,
    pad_to_multiple,
)
from topomap_tpu.parallel.sheet import stylize_sheet_sharded
