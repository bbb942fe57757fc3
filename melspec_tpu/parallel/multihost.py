"""Multi-host input dispatch: per-host WAV sharding feeding a global batch.

The reference is a single-process library — its only cross-boundary
transport is a CUDA stream / SharedArrayBuffer (SURVEY.md §5, "Distributed
communication backend"). On a TPU pod the equivalent scale-out problem is
*input dispatch*: every host of a multi-host mesh must feed its own devices
without shipping audio over DCN. The idiomatic JAX recipe, implemented here:

1. **Static work partition** — ``shard_files_for_host`` deterministically
   assigns the audio work-list (file paths, stream ids) to processes. No
   coordination traffic; every host computes the same partition.
2. **Local load + chunk** — ``chunk_audio`` turns each host's shard of
   decoded samples into a fixed-shape ``[B_local, clip_samples]`` block
   (static shapes keep XLA happy; ragged tails zero-pad, which the whisper
   framing tolerates by construction — ``stft.rs:157`` frame-count rule).
3. **Global array assembly** — ``global_batch_from_local`` wraps
   ``jax.make_array_from_process_local_data``: each host contributes only
   its local block, and the resulting global ``[B, T]`` array is sharded
   batch-axis over the whole mesh with ZERO cross-host data movement (each
   host's samples land on its own addressable devices).
4. **SPMD compute** — the jitted step (``sharded_frontend_step``) runs on
   the global array; the only bytes that cross hosts are the ``psum``
   aggregates XLA inserts, riding ICI/DCN.

Single-process use (tests, one host with N chips) is the degenerate case
``process_count == 1`` of the same code path.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_files_for_host(
    paths: Sequence,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> list:
    """Deterministic round-robin partition of a work-list across hosts.

    Every process calls this with the SAME ``paths`` order and gets a
    disjoint shard; the union over processes covers the list exactly once
    and shard sizes differ by at most one. Defaults read the live process
    topology (``jax.process_index()``/``jax.process_count()``).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} out of range for count {pc}")
    return list(paths[pi::pc])


def chunk_audio(
    clips: Sequence[np.ndarray],
    clip_samples: int,
    pad_to_batch: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Chop a host's decoded clips into a fixed-shape batch block.

    Each 1-D float32 clip is split into consecutive ``clip_samples``
    segments; a short tail is zero-padded (same semantics as the streaming
    path's final short chunk, ``stft.rs:48-64``). Returns
    ``(segments [B_local, clip_samples] f32, n_valid [B_local] i32)`` where
    ``n_valid`` is the count of real (non-pad) samples per row — enough to
    reconstruct the true frame count downstream. ``pad_to_batch`` appends
    all-zero rows (``n_valid == 0``) so every host can present the same
    local batch size to the global assembly.
    """
    rows: List[np.ndarray] = []
    valid: List[int] = []
    for clip in clips:
        clip = np.asarray(clip, dtype=np.float32).reshape(-1)
        for start in range(0, len(clip), clip_samples):
            seg = clip[start : start + clip_samples]
            n = len(seg)
            if n < clip_samples:
                seg = np.pad(seg, (0, clip_samples - n))
            rows.append(seg)
            valid.append(n)
    if pad_to_batch is not None:
        if len(rows) > pad_to_batch:
            raise ValueError(
                f"host produced {len(rows)} segments > pad_to_batch={pad_to_batch}"
            )
        while len(rows) < pad_to_batch:
            rows.append(np.zeros(clip_samples, dtype=np.float32))
            valid.append(0)
    if not rows:
        rows = [np.zeros(clip_samples, dtype=np.float32)]
        valid = [0]
    return np.stack(rows), np.asarray(valid, dtype=np.int32)


def load_host_shard(
    paths: Sequence[Union[str, Path]],
    clip_samples: int,
    pad_to_batch: Optional[int] = None,
    expected_rate: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Decode THIS host's WAV shard and chunk it (steps 1+2 composed).

    ``paths`` must already be the host-local shard (see
    ``shard_files_for_host``). Uses the repo's own RIFF readers — 16-bit
    PCM and f32-LE mono both supported (``io/wav.py``). A wrong-rate wav
    would silently produce features with the wrong filterbank, so
    ``expected_rate`` (when given) is validated per file.
    """
    from melspec_tpu.io.wav import read_wav_mono

    clips = []
    for p in paths:
        samples, rate = read_wav_mono(p)
        if expected_rate is not None and rate != expected_rate:
            raise ValueError(
                f"{p}: sample rate {rate} != expected {expected_rate}"
            )
        clips.append(samples)
    return chunk_audio(clips, clip_samples, pad_to_batch=pad_to_batch)


def global_batch_from_local(
    mesh: Mesh,
    local: np.ndarray,
    axis: str = "batch",
) -> jax.Array:
    """Assemble the global batch-sharded array from per-host local blocks.

    Every participating process passes its own ``[B_local, ...]`` block
    (identical B_local everywhere — use ``pad_to_batch``); the result is a
    global ``[B_local * process_count, ...]`` array sharded ``P(axis)``
    over ``mesh`` whose shards are exactly the local bytes already on each
    host — no DCN transfer happens here.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local))


_STEP_CACHE: OrderedDict = OrderedDict()
_STEP_LOCK = threading.Lock()


def _cached_frontend_step(mesh, settings, axis):
    """One compiled SPMD step per (mesh, settings, axis): rebuilding it
    per call would retrace and recompile the whole program every batch.
    True LRU with per-key reuse — a 17th key evicts only the coldest
    entry, never the whole working set — and thread-safe (concurrent
    misses build outside the lock; first store wins)."""
    key = (mesh, settings, axis)
    with _STEP_LOCK:
        step = _STEP_CACHE.get(key)
        if step is not None:
            _STEP_CACHE.move_to_end(key)
            return step
    from melspec_tpu.parallel.sharding import sharded_frontend_step

    step = sharded_frontend_step(mesh, settings, axis=axis)
    with _STEP_LOCK:
        winner = _STEP_CACHE.setdefault(key, step)
        _STEP_CACHE.move_to_end(key)
        while len(_STEP_CACHE) > 16:  # bounded: meshes/settings are few
            _STEP_CACHE.popitem(last=False)
        return winner


def multihost_frontend(
    mesh: Mesh,
    paths: Sequence[Union[str, Path]],
    clip_samples: int,
    local_batch: int,
    settings=None,
    axis: str = "batch",
):
    """End-to-end multi-host step: shard files -> load locally -> global
    array -> SPMD frontend. Returns ``(outputs, n_valid_local)`` where
    ``outputs`` is the ``sharded_frontend_step`` dict computed on the
    global batch and ``n_valid_local`` the per-row valid-sample counts for
    THIS host's rows.
    """
    from melspec_tpu.config import DetectionSettings

    my_paths = shard_files_for_host(paths)
    local, n_valid = load_host_shard(my_paths, clip_samples,
                                     pad_to_batch=local_batch,
                                     expected_rate=16000)
    global_batch = global_batch_from_local(mesh, local, axis=axis)
    # per-row valid-sample COUNTS: pad rows (0) and zero-padded tail
    # segments both contribute only their real frames to the psum'd
    # VAD aggregates
    valid = global_batch_from_local(mesh, n_valid, axis=axis)
    step = _cached_frontend_step(mesh, settings or DetectionSettings(),
                                 axis)
    return step(global_batch, valid), n_valid
