"""Data-parallel scale-out over an ICI mesh.

The reference's parallelism tops out at one CUDA grid / wgpu dispatch chain
plus host<->device async copies (SURVEY.md §2, parallelism inventory). The
TPU-native scale-out story is batch data parallelism: every audio clip is
independent, so the ``[batch, T]`` axis shards across the mesh with ZERO
per-clip collectives — shardings ride ICI only when an aggregate (e.g.
fleet-wide VAD metrics) is reduced with ``psum``. This module provides:

- ``make_mesh``: a 1-D ``batch`` mesh over the available devices;
- ``shard_batch``: jit a per-clip function with batch-axis in/out shardings
  (XLA inserts nothing — embarrassingly parallel);
- ``sharded_whisper_mel``: the flagship frontend over the mesh;
- ``sharded_frontend_step``: the full multi-frontend step (whisper mel +
  NeMo log-mel + Kaldi fbank + VAD column counts + 8-bit quantization)
  under ``shard_map``, with a ``psum`` over the mesh for the aggregate VAD
  statistics — the one place a collective is the right tool;
- ``sharded_multistream``: the carried-state concurrent-stream mel with
  the stream axis sharded like a batch axis;
- ``sharded_serving``: the COMPLETE serving tick (mel + streaming-VAD
  decisions + u8 quant, optionally + on-device resample) over the mesh.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from melspec_tpu.config import BatchLogMelConfig, DetectionSettings, FbankConfig
from melspec_tpu.ops.batch_logmel import BatchLogMel
from melspec_tpu.ops.fbank import Fbank
from melspec_tpu.ops.spectrogram import WhisperMelPipeline
from melspec_tpu.ops.vad import classify_columns, smooth_mask


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = "batch"
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(fn: Callable, mesh: Mesh, axis: str = "batch") -> Callable:
    """Jit ``fn([B, ...]) -> [B, ...]`` with the leading axis sharded over
    the mesh. Pure data parallelism: no collectives are inserted."""
    spec = NamedSharding(mesh, P(axis))
    return jax.jit(fn, in_shardings=spec, out_shardings=spec)


def sharded_whisper_mel(
    mesh: Mesh,
    fft_size: int = 400,
    hop_size: int = 160,
    n_mels: int = 80,
    sampling_rate: float = 16000.0,
    dtype=jnp.float32,
    axis: str = "batch",
) -> Callable:
    """Batch-sharded whisper log-mel: ``[B, T] -> [B, n_frames, n_mels]``
    with ``B`` split across the mesh."""
    pipe = WhisperMelPipeline(fft_size, hop_size, n_mels, sampling_rate,
                              dtype=dtype)
    return shard_batch(pipe._mel_batch_jit, mesh, axis)


def _stream_axis_spec(mesh: Mesh, axis: str, n_streams: int) -> NamedSharding:
    """Shared validation + leading-axis sharding for the stream-parallel
    entry points (streams are independent; no collectives)."""
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r} (axes: "
                         f"{tuple(mesh.shape)})")
    if n_streams % mesh.shape[axis] != 0:
        raise ValueError(
            f"n_streams must divide evenly over mesh axis {axis!r}"
        )
    return NamedSharding(mesh, P(axis))


def sharded_multistream(
    mesh: Mesh,
    config=None,
    n_streams: int = 64,
    axis: str = "batch",
):
    """Concurrent-stream serving over the mesh: the stream axis of
    ``MultiStreamMel`` shards like a batch axis (streams are independent;
    no collectives). Returns ``(multi, init_fn, push_fn)`` where the state
    and chunk arrays are sharded on their leading axis."""
    from melspec_tpu.config import MelConfig
    from melspec_tpu.streaming.multistream import MultiStreamMel

    config = config or MelConfig()
    spec = _stream_axis_spec(mesh, axis, n_streams)
    multi = MultiStreamMel(config, n_streams)

    from melspec_tpu.streaming.multistream import MultiStreamState

    def init_fn():
        state = multi.init()
        return jax.device_put(state, MultiStreamState(spec, spec))

    push_fn = jax.jit(
        multi.step,
        in_shardings=(MultiStreamState(spec, spec), spec, spec),
        out_shardings=(MultiStreamState(spec, spec), spec, spec),
    )
    return multi, init_fn, push_fn


def sharded_serving(
    mesh: Mesh,
    config=None,
    n_streams: int = 64,
    settings: Optional[DetectionSettings] = None,
    axis: str = "batch",
    input_rate: Optional[int] = None,
):
    """The COMPLETE serving tick — mel + batched streaming-VAD decisions
    + per-frame u8 quantization (``streaming/serving.py``) — over the
    mesh: the stream axis shards like a batch axis (streams are
    independent; no collectives). Returns ``(front, init_fn, tick_fn)``;
    ``tick_fn(state, chunks [S, H, hop], active [S])`` ->
    ``(state, q u8, lo, hi, va, valid)`` with every array sharded on its
    leading (stream) axis. With ``input_rate`` set, the tick is a
    ``SourceRateFrontend`` — chunks carry ``hop_src`` SOURCE-rate samples
    per hop and on-device resampling rides the same dispatch."""
    from melspec_tpu.config import MelConfig
    from melspec_tpu.streaming.multistream import MultiStreamState
    from melspec_tpu.streaming.serving import (FrontendState,
                                               MultiStreamFrontend,
                                               SourceRateFrontend,
                                               VadStreamState)

    config = config or MelConfig()
    settings = settings or DetectionSettings()
    spec = _stream_axis_spec(mesh, axis, n_streams)
    fe_shard = FrontendState(MultiStreamState(spec, spec),
                             VadStreamState(spec, spec))
    if input_rate is not None:
        from melspec_tpu.streaming.resample import MultiResampleState
        from melspec_tpu.streaming.serving import SourceRateState

        front = SourceRateFrontend(config, n_streams,
                                   input_rate=input_rate,
                                   settings=settings)
        st_shard = SourceRateState(MultiResampleState(spec), fe_shard)
    else:
        front = MultiStreamFrontend(config, n_streams, settings=settings)
        st_shard = fe_shard

    def init_fn():
        return jax.device_put(front.init(), st_shard)

    tick_fn = jax.jit(
        lambda state, chunks, active: front._tick_jit(state, chunks,
                                                      active),
        in_shardings=(st_shard, spec, spec),
        out_shardings=(st_shard, spec, spec, spec, spec, spec),
    )
    return front, init_fn, tick_fn


def sharded_frontend_step(
    mesh: Mesh,
    settings: DetectionSettings = DetectionSettings(),
    axis: str = "batch",
    mel_config=None,
    nemo_config=None,
    fbank_config=None,
) -> Callable:
    """The full frontend as one SPMD step over the mesh.

    Per shard (pure local compute): whisper mel, NeMo log-mel, Kaldi fbank,
    VAD raw column activity + smoothing, 8-bit quantization of the mel
    block. Across shards: one ``psum`` reducing the VAD active-column count
    and total-column count — the fleet-level aggregate a serving deployment
    reports.

    All three frontend configs are parameters (``MelConfig``,
    ``BatchLogMelConfig``, ``FbankConfig``; defaults match the reference
    defaults). When whisper and Kaldi share a frame grid — true at the
    defaults — their spectral passes FUSE into one multi-head kernel with
    the Sobel VAD as its epilogue (``ops/sig_multihead.py``); any other
    config combination falls back to per-frontend pipelines, so a 128-mel
    or 8 kHz deployment works too, just without the fusion.

    Returns a fn ``(samples [B, T], valid [B] = all) -> dict`` with ``B``
    divisible by the mesh size. ``valid`` is a bool row mask (a row
    counts fully or not at all) or per-row valid-SAMPLE counts (int):
    pad rows and zero-padded tail segments (multihost ``chunk_audio``)
    then contribute only their real frames to the psum'd VAD aggregates.
    """
    from melspec_tpu.config import MelConfig

    mel_config = mel_config or MelConfig()
    nemo_config = nemo_config or BatchLogMelConfig()
    fbank_config = fbank_config or FbankConfig(apply_cmn=True)
    nemo = BatchLogMel(nemo_config)
    fused = None
    try:
        from melspec_tpu.ops.sig_multihead import WhisperKaldiFused

        fused = WhisperKaldiFused(mel_config, fbank_config)
    except ValueError:
        pass
    if fused is None:
        whisper = WhisperMelPipeline(
            mel_config.fft_size, mel_config.hop_size, mel_config.n_mels,
            float(mel_config.sampling_rate),
        )
        kaldi = Fbank(fbank_config)

    def local_step(samples: jnp.ndarray, n_valid: jnp.ndarray):
        if fused is not None:
            # one spectral pass for whisper + kaldi, Sobel VAD fused as
            # the kernel's epilogue
            mel, fbank_feats, raw = fused.compute_with_vad(samples,
                                                           settings)
        else:
            mel = whisper._mel_batch_jit(samples)      # [b, F, n_mels]
            fbank_feats = kaldi._compute_jit(samples)  # [b, F'', bins]
            img = jnp.swapaxes(mel, -1, -2)            # [b, n_mels, F]
            raw = classify_columns(img, settings)      # [b, F-2]
        nemo_feats = nemo._compute_jit(samples)        # [b, bins, F']
        smoothed = smooth_mask(raw, 4)

        # per-FRAME validity from per-row valid-SAMPLE counts: a
        # zero-padded tail row (multihost chunk_audio) must contribute
        # only its real frames — counting its full width would dilute
        # the fleet aggregate with decisions over padding
        nf = smoothed.shape[-1]
        fft, hop = mel_config.fft_size, mel_config.hop_size
        vframes = jnp.where(n_valid >= fft, (n_valid - fft) // hop + 1, 0)
        vcols = jnp.clip(vframes - 2, 0, nf).astype(jnp.int32)  # Sobel -2
        mask = jnp.arange(nf)[None, :] < vcols[:, None]
        active = jnp.sum(smoothed & mask, dtype=jnp.int32)
        total = jnp.sum(vcols, dtype=jnp.int32)
        active = jax.lax.psum(active, axis)
        total = jax.lax.psum(total, axis)

        # device-side 8-bit quantization of the mel block (per shard) —
        # the shared quantizer keeps Rust-round() bit-exactness and maps
        # a degenerate range (e.g. an all-pad shard: constant mel) to 0
        # instead of NaN->undefined u8
        from melspec_tpu.ops.quant import quantize_jnp

        q, lo, hi = quantize_jnp(mel)

        return {
            "mel": mel,
            "nemo": nemo_feats,
            "fbank": fbank_feats,
            "vad_smoothed": smoothed,
            "vad_active_columns": active,
            "vad_total_columns": total,
            "mel_q8": q,
            "mel_q8_range": jnp.stack([lo, hi])[None],  # [1, 2] per shard
        }

    spec = P(axis)
    step = shard_map(
        local_step,
        mesh=mesh,
        # pallas_call (the fused sig kernels inside the frontends) does
        # not yet annotate varying-mesh-axes metadata; the specs below
        # state the sharding explicitly, so skip the vma check
        check_vma=False,
        in_specs=(spec, spec),
        out_specs={
            "mel": spec,
            "nemo": spec,
            "fbank": spec,
            "vad_smoothed": spec,
            "vad_active_columns": P(),   # psum'd: replicated
            "vad_total_columns": P(),
            "mel_q8": spec,
            "mel_q8_range": spec,
        },
    )
    # Pin the big [B, frames, feats] outputs to the kernels' natural
    # row-major device layout: left to itself XLA assigns the jit's
    # output tuple {1,2,0} (feature-major) layouts and inserts ~0.2 ms
    # of whole-tensor relayout copies per call at 64x10 s (profiler:
    # copy.27-30, [64,998,80] {1,2,0} <- {2,1,0}) — pure waste, since
    # the kernels already store natural order and every consumer
    # (host fetch, wire-record packing, reductions) is layout-agnostic.
    try:
        from jax.experimental.layout import Format, Layout

        rowmajor3 = Format(Layout(major_to_minor=(0, 1, 2)),
                           NamedSharding(mesh, spec))
    except ImportError:  # layout API moved: skip the pin, keep sharding
        rowmajor3 = NamedSharding(mesh, spec)
    out_formats = {
        "mel": rowmajor3,
        "nemo": rowmajor3,
        "fbank": rowmajor3,
        "vad_smoothed": NamedSharding(mesh, spec),
        "vad_active_columns": NamedSharding(mesh, P()),
        "vad_total_columns": NamedSharding(mesh, P()),
        "mel_q8": rowmajor3,
        "mel_q8_range": NamedSharding(mesh, spec),
    }
    jitted = jax.jit(step, out_shardings=out_formats)

    def call(samples, valid=None):
        """``valid`` is either a bool row mask (a row counts fully or not
        at all) or per-row valid-SAMPLE counts (int — rows with zero-pad
        tails contribute only their real frames to the aggregates)."""
        n = samples.shape[-1]
        if valid is None:
            counts = jnp.full(samples.shape[0], n, jnp.int32)
        else:
            is_device = isinstance(valid, jax.Array)
            varr = valid if is_device else np.asarray(valid)
            if varr.dtype == bool:
                counts = jnp.where(jnp.asarray(varr), n, 0) \
                    .astype(jnp.int32)
            else:
                # integer arrays are per-row SAMPLE counts. An integer
                # array holding a 1 and nothing above it is almost
                # certainly a row mask following the pre-count contract —
                # as counts it silently zeroes every row's frames
                # (1 sample < fft_size). Reject it rather than corrupt
                # the fleet aggregates. An ALL-ZERO array is unambiguous
                # (mask and counts agree: nothing valid) and stays
                # accepted — chunk_audio itself emits one for a host
                # with no clips. The check runs on HOST data only: for
                # device arrays it would add a blocking round trip (two
                # reductions + a scalar fetch) to the hot per-batch step
                # path, including multihost global arrays.
                if n > 1 and not is_device and varr.size \
                        and varr.max() == 1 and varr.min() >= 0:
                    raise ValueError(
                        "integer `valid` is interpreted as per-row valid-"
                        "sample counts, but this array holds only 0/1 — "
                        "pass a bool array for a row mask, or real sample "
                        "counts")
                counts = jnp.asarray(varr).astype(jnp.int32)
        return jitted(samples, counts)

    return call
