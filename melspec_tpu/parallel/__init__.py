"""Scale-out: device meshes and sharded batch frontends."""

from melspec_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    sharded_whisper_mel,
    sharded_frontend_step,
)
from melspec_tpu.parallel.multihost import (
    chunk_audio,
    global_batch_from_local,
    load_host_shard,
    multihost_frontend,
    shard_files_for_host,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "sharded_whisper_mel",
    "sharded_frontend_step",
    "chunk_audio",
    "global_batch_from_local",
    "load_host_shard",
    "multihost_frontend",
    "shard_files_for_host",
]
