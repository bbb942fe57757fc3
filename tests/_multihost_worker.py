"""Worker process for the true multi-process input-dispatch test.

Launched N times by ``tests/test_multihost.py`` (and usable standalone).
Each process owns a few virtual CPU devices; together they form one global
mesh federated via ``jax.distributed`` with gloo CPU collectives — the
same topology shape as N TPU hosts on DCN.

argv: process_id num_processes coordinator_port devices_per_proc
"""

import os
import sys

DEVS = int(sys.argv[4])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={DEVS}"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

PID, NPROC, PORT = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{PORT}", num_processes=NPROC,
    process_id=PID,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from melspec_tpu.ops.spectrogram import WhisperMelPipeline  # noqa: E402
from melspec_tpu.parallel import make_mesh  # noqa: E402
from melspec_tpu.parallel.multihost import (  # noqa: E402
    chunk_audio,
    global_batch_from_local,
    shard_files_for_host,
)
from melspec_tpu.parallel.sharding import sharded_whisper_mel  # noqa: E402


def synth_clip(file_id: int, n: int = 9600) -> np.ndarray:
    """Deterministic per-file audio every process can regenerate."""
    rng = np.random.default_rng(1000 + file_id)
    return (rng.normal(size=n) * 0.2).astype(np.float32)


def main() -> None:
    assert jax.process_count() == NPROC, jax.process_count()
    assert jax.local_device_count() == DEVS
    devs = jax.devices()
    assert len(devs) == NPROC * DEVS

    mesh = make_mesh(devs)
    clip_samples = 4800
    files = list(range(8))  # 8 synthetic "WAV files", 2 chunks each

    # 1. static partition — this host's shard
    mine = shard_files_for_host(files)
    # 2. local decode + chunk (pad so every host presents the same B_local)
    local, n_valid = chunk_audio([synth_clip(f) for f in mine], clip_samples,
                                 pad_to_batch=16 // NPROC)
    # 3. global assembly: zero cross-host data movement
    arr = global_batch_from_local(mesh, local)
    assert arr.shape == (16, clip_samples), arr.shape

    # 4. SPMD compute over the global batch
    mel_fn = sharded_whisper_mel(mesh)
    mel = mel_fn(arr)
    total = float(jax.jit(lambda m: jnp.sum(m))(mel))

    # cross-check: every process independently rebuilds the FULL global
    # batch (it knows the whole work-list) and computes the same mel
    # unsharded on its own devices — sums must agree
    full_rows = []
    for p in range(NPROC):
        shard = shard_files_for_host(files, process_index=p,
                                     process_count=NPROC)
        block, _ = chunk_audio([synth_clip(f) for f in shard], clip_samples,
                               pad_to_batch=16 // NPROC)
        full_rows.append(block)
    full = np.concatenate(full_rows)
    pipe = WhisperMelPipeline(400, 160, 80, 16000.0)
    ref_total = float(jnp.sum(pipe._mel_batch_jit(jnp.asarray(full))))
    assert abs(total - ref_total) < 1e-2 * max(1.0, abs(ref_total)), (
        total, ref_total)

    print(f"proc {PID}: OK global_mel={mel.shape} sum={total:.3f}",
          flush=True)


main()
