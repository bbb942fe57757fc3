"""Multi-host input dispatch (parallel/multihost.py).

The reference has no distributed story (SURVEY.md §5); the TPU framework's
scale-out input path is: static file partition -> per-host load/chunk ->
``jax.make_array_from_process_local_data`` -> SPMD step. Covered here at
three levels: pure host logic, single-process global assembly on the
8-device mesh, and a TRUE 2-process run federated over gloo CPU
collectives (the DCN-topology analogue).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from melspec_tpu.parallel import make_mesh
from melspec_tpu.parallel.multihost import (
    chunk_audio,
    global_batch_from_local,
    load_host_shard,
    multihost_frontend,
    shard_files_for_host,
)

REPO = Path(__file__).resolve().parent.parent


def test_shard_files_partition_disjoint_cover_balanced():
    paths = [f"clip{i}.wav" for i in range(37)]
    shards = [shard_files_for_host(paths, process_index=p, process_count=5)
              for p in range(5)]
    flat = [p for s in shards for p in s]
    assert sorted(flat) == sorted(paths)          # cover, disjoint
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1           # balanced
    # deterministic
    assert shards[2] == shard_files_for_host(paths, 2, 5)
    with pytest.raises(ValueError):
        shard_files_for_host(paths, 5, 5)


def test_chunk_audio_segments_tail_and_padding():
    clip = np.arange(1000, dtype=np.float32)
    rows, n_valid = chunk_audio([clip], 400)
    assert rows.shape == (3, 400)
    assert n_valid.tolist() == [400, 400, 200]
    np.testing.assert_array_equal(rows[0], clip[:400])
    np.testing.assert_array_equal(rows[2, :200], clip[800:])
    assert (rows[2, 200:] == 0).all()            # zero-pad like stft.rs:48-64

    rows, n_valid = chunk_audio([clip], 400, pad_to_batch=5)
    assert rows.shape == (5, 400)
    assert n_valid.tolist() == [400, 400, 200, 0, 0]
    with pytest.raises(ValueError):
        chunk_audio([clip], 400, pad_to_batch=2)


def test_global_assembly_single_process_matches_unsharded():
    mesh = make_mesh()
    n_dev = mesh.devices.size
    rng = np.random.default_rng(7)
    local = (rng.normal(size=(2 * n_dev, 4800)) * 0.2).astype(np.float32)
    arr = global_batch_from_local(mesh, local)
    assert arr.shape == local.shape
    np.testing.assert_array_equal(np.asarray(arr), local)
    # each device holds a contiguous batch slice (no resharding happened)
    assert len(arr.addressable_shards) == n_dev

    from melspec_tpu.parallel.sharding import sharded_whisper_mel
    from melspec_tpu.ops.spectrogram import WhisperMelPipeline

    mel = sharded_whisper_mel(mesh)(arr)
    ref = WhisperMelPipeline(400, 160, 80, 16000.0)._mel_batch_jit(
        jnp.asarray(local))
    np.testing.assert_allclose(np.asarray(mel), np.asarray(ref),
                               atol=1e-5, rtol=0)


def test_multihost_frontend_from_real_wavs(testdata):
    wavs = sorted((testdata / "ten-vad").glob("*.wav"))[:2]
    if len(wavs) < 2:
        pytest.fail("vendored ten-vad wavs missing")
    mesh = make_mesh()
    out, n_valid = multihost_frontend(
        mesh, wavs, clip_samples=16000, local_batch=4 * mesh.devices.size)
    assert out["mel"].shape[0] == 4 * mesh.devices.size
    assert out["mel"].shape[2] == 80
    assert (n_valid > 0).sum() >= 2               # real audio rows exist
    # padded rows carry zero signal -> their quantized mel exists but the
    # aggregate VAD counters are finite ints
    assert int(out["vad_total_columns"]) > 0

    # per-host loader agrees with chunk_audio on the same decode
    rows, nv = load_host_shard(wavs, 16000)
    assert rows.ndim == 2 and rows.shape[1] == 16000
    assert (nv > 0).all()


def test_true_two_process_dispatch_over_gloo():
    """Federate 2 processes x 4 CPU devices with jax.distributed + gloo and
    run the full dispatch recipe; the worker asserts the sharded result
    matches an unsharded full-batch recompute."""
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = str(sock.getsockname()[1])
    sock.close()

    worker = str(REPO / "tests" / "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", port, "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i}: OK" in out, out[-3000:]


def test_pad_rows_do_not_dilute_vad_aggregates():
    """Padding rows appended by pad_to_batch (all-zero, valid=False) must
    not count toward the psum'd fleet-level VAD column totals."""
    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.parallel.sharding import sharded_frontend_step

    mesh = make_mesh()
    step = sharded_frontend_step(
        mesh, DetectionSettings(min_energy=0.5, min_y=2, min_x=5, min_mel=0))
    rng = np.random.default_rng(0)
    n = mesh.devices.size
    x = np.zeros((2 * n, 4800), np.float32)
    x[:n] = (rng.normal(size=(n, 4800)) * 0.3).astype(np.float32)
    valid = np.arange(2 * n) < n

    out_all = step(jnp.asarray(x))
    out_masked = step(jnp.asarray(x), jnp.asarray(valid))
    assert int(out_all["vad_total_columns"]) == 2 * n * 26
    assert int(out_masked["vad_total_columns"]) == n * 26  # pads excluded
    assert int(out_masked["vad_active_columns"]) <= int(
        out_all["vad_active_columns"])
