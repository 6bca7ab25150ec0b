from .mesh import (
    make_mesh,
    count_batch_replicated,
    count_batch_hash_sharded,
    hom_histogram_sharded,
)
