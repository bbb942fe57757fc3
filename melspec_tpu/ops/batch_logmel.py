"""NeMo/Parakeet-style batch log-mel frontend.

Behavioral parity with the reference's ``BatchLogMelSpectrogram``
(``src/mel.rs:172-433``, helpers ``685-756``), redesigned as one jitted XLA
program over ``[..., T]`` instead of a per-frame scratch-buffer loop:

- optional pre-emphasis over the whole waveform ``y[n] = x[n] - c*x[n-1]``,
  ``y[0] = x[0]`` (``src/mel.rs:696-706``);
- ``center=True`` zero-pads ``n_fft/2`` on both sides (zero padding, NOT
  reflect — ``src/mel.rs:685-694``);
- frame count ``len//hop + 1`` when centered, ``(len-n_fft)//hop + 1``
  otherwise (``src/mel.rs:387-395``);
- symmetric Hann of ``win_length`` centered inside ``n_fft``
  (``src/mel.rs:708-719``);
- power spectrum over all ``n_fft//2+1`` bins (Nyquist included, unlike the
  whisper path), Slaney filterbank matmul, ``ln(energy + guard)``;
- feature-major output ``[..., n_mels, padded_frames]`` with ``pad_to``
  column padding (``src/mel.rs:751-756``);
- optional per-feature mean/std normalization over valid frames only, with
  ``max(valid-1, 1)`` variance denominator and ``std + 1e-5``
  (``src/mel.rs:721-749``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.config import BatchLogMelConfig
from melspec_tpu.ops import dft, framing
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.ops.windows import hann_centered


def pad_len(length: int, pad_to: int) -> int:
    """Round ``length`` up to a multiple of ``pad_to`` (0 = no padding)."""
    if pad_to == 0:
        return length
    return -(-length // pad_to) * pad_to


class BatchLogMel:
    """Precompiled NeMo-style frontend for one config.

    ``compute(samples)`` takes ``[T]`` or ``[B, T]`` float32 and returns
    ``[..., n_mels, padded_frames]`` in the pipeline dtype.
    """

    def __init__(self, config: BatchLogMelConfig = BatchLogMelConfig(),
                 dtype=jnp.float32, fft_impl: str = "auto"):
        if fft_impl == "auto":
            # fused sig kernel on MXU backends when the geometry and dtype
            # qualify; the CPU default stays the HIGHEST-precision rdft
            from melspec_tpu.ops.mel_kernel import sig_geometry

            eligible = (
                jax.default_backend() in ("tpu", "gpu")
                and sig_geometry(config.n_fft, config.hop_length) is not None
                and jnp.dtype(dtype) == jnp.float32
            )
            fft_impl = "sig" if eligible else "rdft"
        if fft_impl not in ("rdft", "fft", "hp", "sig"):
            raise ValueError(
                "fft_impl must be 'auto', 'rdft', 'fft', 'hp' or 'sig'"
            )
        if fft_impl == "sig":
            from melspec_tpu.ops.mel_kernel import sig_geometry

            self._sig_geom = sig_geometry(config.n_fft, config.hop_length)
            if self._sig_geom is None:
                raise ValueError(
                    "fft_impl='sig': no macro-row geometry for this "
                    "(n_fft, hop_length)"
                )
            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError("fft_impl='sig' is float32-only")
        self.config = config
        self.dtype = dtype
        self.fft_impl = fft_impl
        self.fft_bins = config.fft_bins

        filters = mel_filterbank(
            float(config.sample_rate),
            config.n_fft,
            config.n_mels,
            f_min=config.f_min,
            f_max=config.effective_f_max,
            htk=config.htk,
            norm=config.norm,
        )
        self._filters_np = filters
        self.filters_t = jnp.asarray(filters.T, dtype=dtype)  # [bins, n_mels]
        self._window_np = hann_centered(config.n_fft, config.win_length)
        self.window = jnp.asarray(self._window_np, dtype=dtype)
        if fft_impl == "sig":
            from melspec_tpu.ops.mel_kernel import (_sig_frontend_matrices,
                                                    bf2_stack)

            # centered frames are zero outside the win_length window, so
            # the K blocks pack to just that interior (512 -> 400 rows at
            # the whisper-NeMo defaults: 20% fewer MXU passes, exact);
            # npack="auto" additionally N-packs the 257-bin head's re|im
            # columns into 512 lanes instead of 768 (im of DC/Nyquist is
            # exactly zero) — one third less work in the dominant dot
            self._sig_pack = config.win_length
            self._sig_pack_off = (config.n_fft - config.win_length) // 2
            m_big, pair_i, mt, _, _, _, npack = _sig_frontend_matrices(
                config.n_fft, self.fft_bins, self._window_np, filters,
                ks=3, km=3, cutoff=2,
                pack=self._sig_pack, pack_off=self._sig_pack_off,
            )
            self._sig_m_big = m_big
            self._sig_pair_i = pair_i
            self._sig_npack = npack
            self._sig_mt = bf2_stack(mt)

    @property
    def filters(self) -> np.ndarray:
        return self._filters_np

    def num_frames(self, sample_len: int) -> int:
        if self.config.center:
            return framing.num_frames_centered(sample_len, self.config.hop_length)
        return framing.num_frames_batch(
            sample_len, self.config.n_fft, self.config.hop_length
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _compute_jit(self, samples: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = samples.astype(self.dtype)
        n = x.shape[-1]

        if cfg.preemphasis != 0.0:
            prev = jnp.concatenate([x[..., :1] * 0.0, x[..., :-1]], axis=-1)
            x = x - jnp.asarray(cfg.preemphasis, self.dtype) * prev
            # y[0] = x[0]: the zeroed first `prev` element already ensures it.

        valid = self.num_frames(n)
        if cfg.center:
            pad = cfg.n_fft // 2
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])

        # ensure the block-framing view has enough tail samples
        needed = (valid - 1) * cfg.hop_length + cfg.n_fft
        if x.shape[-1] < needed:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, needed - x.shape[-1])])

        if self.fft_impl == "sig":
            # fused signal-input Pallas kernel: framing + windowed rDFT +
            # power + filterbank + ln(x+guard) in ONE kernel over VMEM
            # tiles (in-kernel framing — the [frames, n_fft] tensor is
            # never materialized). Preemphasis/center-pad above are plain
            # XLA; the norm/pad_to below fuse behind the kernel output.
            from melspec_tpu.ops.mel_kernel import _pallas_sig_mel

            lead = x.shape[:-1]
            x2 = x.reshape((-1, x.shape[-1])).astype(jnp.float32)
            row_w, phases, rows_tile = self._sig_geom
            mel = _pallas_sig_mel(
                x2, self._sig_m_big, self._sig_mt,
                interpret=jax.default_backend() not in ("tpu", "gpu"),
                ks=3, pair_i=self._sig_pair_i, n_frames=valid,
                pack=self._sig_pack, pack_off=self._sig_pack_off,
                npack=self._sig_npack, mel_precision="bf2",
                out_mode="ln_guard", guard=float(cfg.log_zero_guard),
                n_mels_out=cfg.n_mels, row_w=row_w, phases=phases,
                rows_tile=rows_tile,
            )  # [B, valid, n_mels]
            feats = jnp.swapaxes(mel, -1, -2).reshape(
                lead + (cfg.n_mels, valid)
            ).astype(self.dtype)
            return self._norm_and_pad(feats, valid)

        frames = framing.frame_signal(x, cfg.n_fft, cfg.hop_length, valid)
        if self.fft_impl == "hp":
            from melspec_tpu.ops.hp_dft import hp_rdft_power_windowed

            power = hp_rdft_power_windowed(
                frames.astype(jnp.float32), self._window_np, cfg.n_fft,
                self.fft_bins,
            ).astype(self.dtype)
        else:
            xw = frames * self.window
            if self.fft_impl == "rdft":
                power = dft.rdft_power(xw, cfg.n_fft, self.fft_bins,
                                       dtype=self.dtype)
            else:
                spec = jnp.fft.rfft(xw, axis=-1)
                power = (jnp.real(spec) ** 2
                         + jnp.imag(spec) ** 2).astype(self.dtype)

        energy = jnp.matmul(power, self.filters_t, preferred_element_type=self.dtype,
                            precision=jax.lax.Precision.HIGHEST)
        from melspec_tpu.ops.fastmath import ln_best

        feats = ln_best(energy + jnp.asarray(cfg.log_zero_guard, self.dtype),
                        self.dtype)
        feats = jnp.swapaxes(feats, -1, -2)  # [..., n_mels, valid]
        return self._norm_and_pad(feats, valid)

    def _norm_and_pad(self, feats: jnp.ndarray, valid: int) -> jnp.ndarray:
        cfg = self.config
        if cfg.normalize_per_feature:
            mean = jnp.mean(feats, axis=-1, keepdims=True)
            denom = max(valid - 1, 1)
            var = jnp.sum((feats - mean) ** 2, axis=-1, keepdims=True) / denom
            std = jnp.sqrt(var) + jnp.asarray(1e-5, self.dtype)
            feats = (feats - mean) / std

        padded = pad_len(valid, cfg.pad_to)
        if padded > valid:
            feats = jnp.pad(
                feats, [(0, 0)] * (feats.ndim - 1) + [(0, padded - valid)]
            )
        return feats

    def compute(self, samples) -> jnp.ndarray:
        samples = jnp.asarray(samples)
        if samples.shape[-1] == 0:
            return jnp.zeros(
                samples.shape[:-1] + (self.config.n_mels, 0), dtype=self.dtype
            )
        return self._compute_jit(samples)

    def compute_flat(self, samples) -> tuple[np.ndarray, int, int]:
        """Flat row-major output + (rows, cols), mirroring the reference's
        ``compute_flat_with_scratch`` return surface (``src/mel.rs:321-385``)."""
        feats = np.asarray(self.compute(samples), dtype=np.float32)
        rows, cols = feats.shape[-2], feats.shape[-1]
        return feats.reshape(feats.shape[:-2] + (rows * cols,)), rows, cols


def mel_tensor(frames: np.ndarray, n_mels: int):
    """Package flat feature-major mel frames for an ONNX-style ASR runtime:
    ``(features[1, n_mels, T] float32, lengths[1] int64)``
    (reference ``src/mel.rs:420-433``, feature ``ort-tensor``)."""
    frames = np.asarray(frames, dtype=np.float32).reshape(-1)
    num_frames = frames.size // n_mels
    audio = frames[: n_mels * num_frames].reshape(1, n_mels, num_frames)
    lengths = np.asarray([num_frames], dtype=np.int64)
    return audio, lengths


def run_asr_session(model, frames, n_mels: int,
                    audio_key: str = "audio_signal",
                    length_key: str = "length"):
    """Execute an ONNX Runtime ASR session on packaged mel features — the
    executable half of the reference's ``ort-tensor`` feature (its
    ``mel_tensor`` output feeds ``ort``'s session inputs,
    ``src/mel.rs:420-433``): ``session.run(None, {audio_key: mel[1,
    n_mels, T] f32, length_key: [T] i64})``.

    ``model`` is either an already-constructed session (anything with a
    ``.run(output_names, feeds)`` method — an ``ort.InferenceSession``,
    or a test double) or a filesystem path to a ``.onnx`` model, in which
    case ``onnxruntime`` is imported lazily; environments without it get
    an ``ImportError`` that says exactly what to install, and nothing
    else in the package depends on the import succeeding."""
    audio, lengths = mel_tensor(frames, n_mels)
    feeds = {audio_key: audio, length_key: lengths}
    if hasattr(model, "run"):
        return model.run(None, feeds)
    try:
        import onnxruntime as ort
    except ImportError as e:  # pragma: no cover - exercised via fake dep
        raise ImportError(
            "run_asr_session(path) needs the optional 'onnxruntime' "
            "package (pip install onnxruntime); alternatively pass an "
            "already-constructed session object"
        ) from e
    return ort.InferenceSession(str(model)).run(None, feeds)
