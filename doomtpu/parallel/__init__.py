from doomtpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate,
)
