"""Whisper-compatible batched log-mel spectrogram.

This module replaces three reference backends at once — the per-frame CPU
loop (``src/stft.rs:89-138`` + ``src/mel.rs:13-32``), the cuFFT/CUDA kernel
path (``src/cuda.rs``, ``src/cuda_kernels.cu``) and the wgpu/WGSL path
(``src/wgpu.rs``, ``src/wgpu.wgsl``) — with one jitted, fused XLA program:

    frame-gather -> window mult -> real-DFT matmul (MXU) -> power
    -> dense filterbank matmul (MXU) -> log10 -> whisper norm

Exact semantics preserved:
- periodic Hann window (``src/stft.rs:29-31``);
- mel projection zeroes FFT bins >= fft_size/2 — i.e. the Nyquist column of
  the [n_mels, fft/2+1] filterbank never contributes
  (``src/mel.rs:148-168``);
- ``log10(max(energy, 1e-10))`` floor;
- whisper norm ``(max(x, max-8)+4)/4`` with the max taken per frame in the
  streaming path (``src/mel.rs:26-31,645-654``) — the JFK golden was
  produced that way (SURVEY.md hard part (a)).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.ops import dft, framing
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.ops.windows import hann_periodic

LOG10_FLOOR = 1e-10


def _frames_budget_bytes() -> int:
    """HBM budget for the materialized frames tensor (see mel_batch)."""
    import os

    return int(os.environ.get("MELSPEC_FRAMES_BUDGET_BYTES", 1 << 30))


def _sig_budget_bytes() -> int:
    """HBM budget for the sig kernel's REAL footprint — input signal +
    final-layout output; it never materializes a frames tensor — so the
    single-dispatch ceiling sits near device memory (256 x 300 s =
    ~7.4 GB in+out runs as one dispatch on a 16 GB v5e)."""
    import os

    return int(os.environ.get("MELSPEC_SIG_BUDGET_BYTES", 8 << 30))


@functools.partial(jax.jit, donate_argnums=0)
def _acc_update(acc: jnp.ndarray, chunk: jnp.ndarray, i0) -> jnp.ndarray:
    """In-place (donated) write of a batch chunk into the accumulator —
    chunked huge-batch runs must not double their output footprint the way
    a final concatenate would."""
    return jax.lax.dynamic_update_slice(
        acc, chunk.astype(acc.dtype),
        (i0,) + (jnp.zeros((), jnp.int32),) * (acc.ndim - 1),
    )


def chunked_over_batch(run, x: jnp.ndarray, chunk_b: int,
                       out_tail: tuple, dtype) -> jnp.ndarray:
    """Run ``run`` over batch chunks of ``x``, accumulating into one
    donated output buffer (constant memory overhead per chunk)."""
    b = x.shape[0]
    acc = jnp.zeros((b,) + out_tail, dtype=dtype)
    for i in range(0, b, chunk_b):
        acc = _acc_update(acc, run(x[i : i + chunk_b]),
                          jnp.asarray(i, jnp.int32))
    return acc


def whisper_norm(log_mel: jnp.ndarray, axis=None) -> jnp.ndarray:
    """Whisper dynamic-range normalization ``(max(x, max-8)+4)/4``.

    ``axis=None`` normalizes over the whole array (reference ``norm_mel``,
    ``src/mel.rs:449-455``); pass an axis for per-frame normalization
    (reference ``norm_mel_slice_f64``, ``src/mel.rs:645-654``).
    """
    mmax = jnp.max(log_mel, axis=axis, keepdims=axis is not None) - 8.0
    return (jnp.maximum(log_mel, mmax) + 4.0) / 4.0


# Familiar-name aliases for users coming from the reference API
def norm_mel(mel_spec) -> jnp.ndarray:
    """Global-max whisper norm (reference ``norm_mel``, ``src/mel.rs:449-455``)."""
    return whisper_norm(jnp.asarray(mel_spec))


def norm_mel_vec(mel_spec) -> np.ndarray:
    """Float32 vector variant (reference ``norm_mel_vec``, ``src/mel.rs:458-469``)."""
    return np.asarray(whisper_norm(jnp.asarray(mel_spec, jnp.float32)))


def log_mel_spectrogram(fft_frame, mel_filters) -> np.ndarray:
    """Project one complex FFT frame through a dense filterbank:
    ``[n_mels, 1]`` of ``log10(max(energy, 1e-10))`` with bins >=
    ``len(fft)/2`` zeroed (reference ``src/mel.rs:437-442`` +
    ``project_stft_log10`` semantics)."""
    fft_frame = np.asarray(fft_frame)
    mel_filters = np.asarray(mel_filters, dtype=np.float64)
    half = fft_frame.shape[-1] // 2
    power = np.abs(fft_frame[..., :half]) ** 2
    energy = mel_filters[:, :half] @ power
    return np.log10(np.maximum(energy, LOG10_FLOOR))[:, None]


def stft_frames(samples, fft_size: int, hop_size: int) -> np.ndarray:
    """Batch STFT returning raw complex FFT frames ``[n_frames, fft_size]``
    (the analogue of ``Spectrogram::compute_all_cpu``,
    ``src/stft.rs:89-115``): periodic Hann window, frame k starting at
    ``k*hop``. Host float64 — for feature pipelines use the fused device
    paths."""
    samples = np.asarray(samples, dtype=np.float64)
    nf = framing.num_frames_batch(len(samples), fft_size, hop_size)
    if nf <= 0:
        return np.zeros((0, fft_size), dtype=np.complex128)
    window = hann_periodic(fft_size)
    idx = np.arange(nf)[:, None] * hop_size + np.arange(fft_size)
    return np.fft.fft(samples[idx] * window, axis=-1)


class MelProjection:
    """Stateful FFT-frame -> normalized mel column projector — the direct
    analogue of the reference's ``MelSpectrogram`` (``src/mel.rs:13-32``):
    whisper-norm is applied per frame."""

    def __init__(self, fft_size: int, sampling_rate: float, n_mels: int):
        self.fft_size = fft_size
        self.filters = mel_filterbank(sampling_rate, fft_size, n_mels)

    def add(self, fft_frame) -> np.ndarray:
        log_mel = log_mel_spectrogram(fft_frame, self.filters)
        mmax = log_mel.max() - 8.0
        return (np.maximum(log_mel, mmax) + 4.0) / 4.0


def log_mel_from_power(
    power: jnp.ndarray, filters_t: jnp.ndarray, dtype=jnp.float32
) -> jnp.ndarray:
    """``log10(max(power @ filters_t, 1e-10))``.

    ``power`` is ``[..., n_used_bins]``, ``filters_t`` is
    ``[n_used_bins, n_mels]`` (already truncated to the bins that the
    reference's projection does not zero).
    """
    energy = jnp.matmul(power, filters_t, preferred_element_type=dtype,
                        precision=jax.lax.Precision.HIGHEST)
    from melspec_tpu.ops.fastmath import log10_best

    return log10_best(jnp.maximum(energy, jnp.asarray(LOG10_FLOOR, dtype=dtype)), dtype)


class WhisperMelPipeline:
    """Precompiled whisper log-mel frontend for one (fft, hop, n_mels, sr) config.

    Public entry points:
    - ``mel_batch(samples)``: batch framing (frame k starts at ``k*hop``) —
      the analogue of ``Spectrogram::compute_mel_spectrogram_cpu``
      (``src/stft.rs:119-138``) and of both GPU backends. Returns
      ``[..., n_frames, n_mels]``.
    - ``mel_streaming_equivalent(samples)``: bit-compatible with the
      reference's streaming RingBuffer path (``src/rb.rs:86-121``): frames
      offset by ``ceil(fft/hop)*hop - fft`` samples, per-frame whisper norm.
      Returns ``[..., n_mels, n_frames]`` (feature-major like the golden).
    """

    def __init__(
        self,
        fft_size: int = 400,
        hop_size: int = 160,
        n_mels: int = 80,
        sampling_rate: float = 16000.0,
        dtype=jnp.float32,
        fft_impl: str = "auto",
        hp_n_slices: int = 5,
        hp_max_pair_sum: int = 5,
    ):
        if fft_impl == "auto":
            # the DFT-matmul feeds the MXU; scalar backends are faster with
            # a real FFT (measured: 6.5k x RT vs 1.9k x RT on one CPU core).
            # On MXU backends the fused signal-input Pallas kernel ("sig",
            # in-kernel framing + bf3 numerics) is the fastest path where
            # its macro-row geometry applies; "bf3" XLA otherwise.
            if jax.default_backend() in ("tpu", "gpu"):
                from melspec_tpu.ops.framing import streaming_frame_offset
                from melspec_tpu.ops.mel_kernel import sig_geometry

                off = streaming_frame_offset(fft_size, hop_size)
                sig_ok = (sig_geometry(fft_size, hop_size, off) is not None
                          and jnp.dtype(dtype) == jnp.float32)
                fft_impl = "sig" if sig_ok else "bf3"
            else:
                fft_impl = "fft"
        if fft_impl not in ("rdft", "fft", "hp", "bf3", "sig"):
            raise ValueError(
                "fft_impl must be 'auto', 'rdft', 'fft', 'hp', 'bf3' or 'sig'"
            )
        if fft_impl == "sig":
            from melspec_tpu.ops.framing import streaming_frame_offset
            from melspec_tpu.ops.mel_kernel import sig_geometry

            off = streaming_frame_offset(fft_size, hop_size)
            if sig_geometry(fft_size, hop_size, off) is None:
                raise ValueError(
                    "fft_impl='sig': no macro-row geometry for this "
                    "(fft, hop) — every standard speech config qualifies"
                )
            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError("fft_impl='sig' is float32-only")
        self.hp_n_slices = hp_n_slices
        self.hp_max_pair_sum = hp_max_pair_sum
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.n_mels = n_mels
        self.sampling_rate = sampling_rate
        self.dtype = dtype
        self.fft_impl = fft_impl

        self.half = fft_size // 2  # bins >= half are zeroed by the projection
        filters = mel_filterbank(sampling_rate, fft_size, n_mels)  # [n_mels, half+1]
        self._filters_np = filters
        self.filters_t = jnp.asarray(filters[:, : self.half].T, dtype=dtype)
        self.window = jnp.asarray(hann_periodic(fft_size), dtype=dtype)

    @property
    def filters(self) -> np.ndarray:
        """Dense float64 filterbank ``[n_mels, fft//2+1]`` (source of truth)."""
        return self._filters_np

    def _power(self, frames: jnp.ndarray) -> jnp.ndarray:
        if self.fft_impl == "hp":
            # window folded into the sliced matrices (exact signal path)
            from melspec_tpu.ops.hp_dft import hp_rdft_power

            return hp_rdft_power(
                frames.astype(jnp.float32), self.fft_size, self.half,
                n_slices=self.hp_n_slices,
                max_pair_sum=self.hp_max_pair_sum,
                hann_windowed=True,
            )
        if self.fft_impl == "bf3":
            from melspec_tpu.ops.hp_dft import bf3_rdft_power

            return bf3_rdft_power(
                frames.astype(jnp.float32), self.fft_size, self.half,
                hann_windowed=True,
            )
        xw = frames.astype(self.dtype) * self.window
        if self.fft_impl == "rdft":
            return dft.rdft_power(xw, self.fft_size, self.half, dtype=self.dtype)
        spec = jnp.fft.rfft(xw, axis=-1)[..., : self.half]
        return (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).astype(self.dtype)

    def _log_mel_frames(self, frames: jnp.ndarray) -> jnp.ndarray:
        return log_mel_from_power(self._power(frames), self.filters_t, self.dtype)

    @functools.partial(jax.jit, static_argnums=0)
    def _mel_batch_jit(self, samples: jnp.ndarray) -> jnp.ndarray:
        if self.fft_impl == "sig":
            return self._sig_mel(samples, streaming=False)
        n = samples.shape[-1]
        nf = framing.num_frames_batch(n, self.fft_size, self.hop_size)
        frames = framing.frame_signal(samples, self.fft_size, self.hop_size, nf)
        log_mel = self._log_mel_frames(frames)
        return whisper_norm(log_mel, axis=-1)

    def _sig_mel(self, samples: jnp.ndarray, streaming: bool) -> jnp.ndarray:
        """Route through the fused signal-input Pallas kernel (interpret
        mode off-MXU so the same instance still works on CPU)."""
        from melspec_tpu.ops.mel_kernel import whisper_mel_sig

        lead = samples.shape[:-1]
        x2 = samples.reshape((-1, samples.shape[-1])).astype(jnp.float32)
        out = whisper_mel_sig(
            x2, self.fft_size, self.hop_size, self.n_mels,
            self.sampling_rate, streaming=streaming,
            interpret=jax.default_backend() not in ("tpu", "gpu"),
        )
        return out.reshape(lead + out.shape[1:])

    @functools.partial(jax.jit, static_argnums=0)
    def _mel_streaming_jit(self, samples: jnp.ndarray) -> jnp.ndarray:
        if self.fft_impl == "sig":
            normed = self._sig_mel(samples, streaming=True)
            return jnp.swapaxes(normed, -1, -2)
        n = samples.shape[-1]
        nf = framing.num_frames_streaming(n, self.fft_size, self.hop_size)
        offset = framing.streaming_frame_offset(self.fft_size, self.hop_size)
        usable = (n // self.hop_size) * self.hop_size
        frames = framing.frame_signal(
            samples[..., :usable], self.fft_size, self.hop_size, nf, offset=offset
        )
        log_mel = self._log_mel_frames(frames)
        normed = whisper_norm(log_mel, axis=-1)
        return jnp.swapaxes(normed, -1, -2)  # [..., n_mels, n_frames]

    def mel_batch(self, samples) -> jnp.ndarray:
        """Whisper log-mel, batch framing. ``samples`` ``[T]`` or ``[B, T]`` ->
        ``[n_frames, n_mels]`` / ``[B, n_frames, n_mels]``.

        Large batches are processed in HBM-budget-sized chunks so the
        materialized ``[frames, fft]`` tensor stays bounded — the TPU
        analogue of the reference's 64 MiB device-batch policy capped at
        8192 frames (``src/cuda.rs:150-155``). Budget:
        ``MELSPEC_FRAMES_BUDGET_BYTES`` (default 1 GiB of frame tensor).
        The fused ``sig`` kernel never materializes frames (in-kernel
        framing, final-layout output), so its budget is the real
        input+output footprint instead — ``MELSPEC_SIG_BUDGET_BYTES``
        (default 8 GiB) — and huge batches stay one dispatch.
        """
        samples = jnp.asarray(samples)
        nf = framing.num_frames_batch(samples.shape[-1], self.fft_size,
                                      self.hop_size)
        if nf == 0:
            return jnp.zeros(samples.shape[:-1] + (0, self.n_mels), dtype=self.dtype)
        k_pad = -(-self.fft_size // 128) * 128
        if self.fft_impl == "sig":
            budget = _sig_budget_bytes()
            per_clip = (samples.shape[-1] + nf * self.n_mels) * 4
        else:
            budget = _frames_budget_bytes()
            per_clip = nf * k_pad * 4
        b = samples.shape[0] if samples.ndim > 1 else 1
        if b * per_clip <= budget:
            return self._mel_batch_jit(samples)
        if samples.ndim > 1 and per_clip <= budget:
            # chunk over the batch axis (clips are independent)
            cb = max(1, int(budget // per_clip))
            return chunked_over_batch(
                self._mel_batch_jit, samples, cb, (nf, self.n_mels),
                self.dtype,
            )
        # single clip too large: chunk over time at frame boundaries
        # (frame k covers samples [k*hop, k*hop + fft) — chunks overlap by
        # fft - hop samples, outputs concatenate exactly)
        per_frame = ((self.hop_size + self.n_mels) * 4
                     if self.fft_impl == "sig" else k_pad * 4)
        cf = max(1, int(budget // per_frame))
        squeeze = samples.ndim == 1
        x = samples[None] if squeeze else samples
        outs = []
        for f0 in range(0, nf, cf):
            f1 = min(f0 + cf, nf)
            s0 = f0 * self.hop_size
            s1 = (f1 - 1) * self.hop_size + self.fft_size
            outs.append(self._mel_batch_jit(x[:, s0:s1]))
        out = jnp.concatenate(outs, axis=-2)
        return out[0] if squeeze else out

    def mel_streaming_equivalent(self, samples) -> jnp.ndarray:
        """Whisper log-mel matching the streaming RingBuffer path exactly;
        feature-major ``[..., n_mels, n_frames]``."""
        samples = jnp.asarray(samples)
        if framing.num_frames_streaming(samples.shape[-1], self.fft_size, self.hop_size) == 0:
            return jnp.zeros(samples.shape[:-1] + (self.n_mels, 0), dtype=self.dtype)
        return self._mel_streaming_jit(samples)


@functools.lru_cache(maxsize=16)
def _cached_pipeline(
    fft_size: int, hop_size: int, n_mels: int, sampling_rate: float, dtype_name: str,
    fft_impl: str,
) -> WhisperMelPipeline:
    return WhisperMelPipeline(
        fft_size, hop_size, n_mels, sampling_rate,
        dtype=jnp.dtype(dtype_name), fft_impl=fft_impl,
    )


def compute_mel_spectrogram(
    samples,
    fft_size: int,
    hop_size: int,
    n_mels: int,
    sampling_rate: float,
    dtype=jnp.float32,
    fft_impl: str = "auto",
) -> np.ndarray:
    """Drop-in analogue of ``Spectrogram::compute_mel_spectrogram_cpu``
    (reference ``src/stft.rs:119-138``): returns ``[n_frames, n_mels]``
    float32 numpy, one whisper-normalized row per frame."""
    pipe = _cached_pipeline(
        fft_size, hop_size, n_mels, float(sampling_rate),
        jnp.dtype(dtype).name, fft_impl,
    )
    return np.asarray(pipe.mel_batch(samples), dtype=np.float32)


def compute_streaming_mel(
    samples,
    fft_size: int,
    hop_size: int,
    n_mels: int,
    sampling_rate: float,
    dtype=jnp.float32,
    fft_impl: str = "auto",
) -> np.ndarray:
    """Batched computation reproducing the reference's streaming
    RingBuffer -> Spectrogram -> MelSpectrogram pipeline output
    (``src/rb.rs:86-121``) exactly: ``[n_mels, n_frames]`` float32."""
    pipe = _cached_pipeline(
        fft_size, hop_size, n_mels, float(sampling_rate),
        jnp.dtype(dtype).name, fft_impl,
    )
    return np.asarray(pipe.mel_streaming_equivalent(samples), dtype=np.float32)
