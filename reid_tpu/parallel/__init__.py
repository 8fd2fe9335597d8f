from .mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_gallery_topk,
)
