from .mesh import (
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    shard_params_tp,
    sharded_gallery_topk,
)
