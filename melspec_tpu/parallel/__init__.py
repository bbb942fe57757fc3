"""Scale-out: device meshes and sharded batch frontends."""

from melspec_tpu.parallel.sharding import (
    make_mesh,
    shard_batch,
    sharded_frontend_step,
    sharded_multistream,
    sharded_serving,
    sharded_whisper_mel,
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
    "sharded_frontend_step",
    "sharded_multistream",
    "sharded_serving",
    "sharded_whisper_mel",
    "chunk_audio",
    "global_batch_from_local",
    "load_host_shard",
    "multihost_frontend",
    "shard_files_for_host",
]
