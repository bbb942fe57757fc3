"""Scale-out: device meshes and sharded batch frontends."""

from melspec_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    sharded_whisper_mel,
    sharded_frontend_step,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "sharded_whisper_mel",
    "sharded_frontend_step",
]
