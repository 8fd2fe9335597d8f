from .mesh import (
    default_mesh,
    fit_mesh,
    init_multihost,
    make_mesh,
    make_mesh_2d,
    place_batch,
    replicate,
    shard_batch,
    shard_params_tp,
    sharded_gallery_topk,
)
