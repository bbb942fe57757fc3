"""Kaldi-compatible filterbank features.

Behavioral parity with the reference's ``Fbank`` (``src/fbank.rs``), written
as one batched XLA program instead of a per-frame scratch loop. The fiddly
Kaldi edge cases (SURVEY.md hard part (c)) are preserved exactly:

- frames of ``frame_length_samples`` every ``frame_shift_samples`` from the
  RAW signal, ``1 + (len-frame_len)//shift`` frames (``src/fbank.rs:151``);
- per-frame DC removal: subtract the frame mean (``src/fbank.rs:163-169``);
- pre-emphasis on the DC-removed frame, ``y[i] = d[i] - p*d[i-1]``; the
  first sample uses the sample *before* the frame, re-centered with THIS
  frame's mean, and frame 0's first sample is left untouched
  (``src/fbank.rs:171-181``);
- Povey window, zero-pad to the next power of two, rFFT power (or
  magnitude), Kaldi filterbank projection, ``max(floor, e)`` with
  ``floor = energy_floor or f32-epsilon``, ``ln``
  (``src/fbank.rs:183-221``);
- optional CMN: subtract the per-bin mean over time
  (``src/fbank.rs:224-233``).

``dither`` and ``use_energy`` are accepted for config compatibility; like
the reference's compute path, they do not alter the output (dither defaults
to 0 for inference; pass a PRNG key to ``compute`` to enable it as a
documented extension).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.config import FbankConfig
from melspec_tpu.ops import dft, framing
from melspec_tpu.ops.filterbank import kaldi_filterbank
from melspec_tpu.ops.windows import povey

F32_EPSILON = 1.1920929e-07


def kaldi_preproc_matrix(frame_len: int, preemphasis: float) -> np.ndarray:
    """The per-frame linear preprocessing as one ``[L, L]`` matrix:
    DC removal ``(I - 11^T/L)`` followed by in-frame preemphasis
    ``(I - p*S)`` (reference ``src/fbank.rs:163-181``; the cross-frame
    first-sample term is spectrally irrelevant because the Povey window
    has w[0] == 0 exactly). Single owner — the sig-kernel fold, its
    tests and the A/B tool all build from here."""
    L = frame_len
    P = np.eye(L)
    if preemphasis > 0.0:
        P[np.arange(1, L), np.arange(L - 1)] = -preemphasis
    return P @ (np.eye(L) - np.full((L, L), 1.0 / L))


class Fbank:
    """Precompiled Kaldi fbank extractor for one config.

    ``compute(samples)`` takes ``[T]`` or ``[B, T]`` and returns
    ``[..., num_frames, num_mel_bins]`` in the pipeline dtype (frame-major,
    like the reference).
    """

    def __init__(self, config: FbankConfig = FbankConfig(), dtype=jnp.float32,
                 fft_impl: str = "auto"):
        if fft_impl == "auto":
            # fused sig kernel on MXU backends when the geometry, dtype
            # and output mode qualify; CPU keeps the rdft default
            from melspec_tpu.ops.mel_kernel import sig_geometry

            eligible = (
                jax.default_backend() in ("tpu", "gpu")
                and sig_geometry(config.frame_length_samples,
                                 config.frame_shift_samples) is not None
                and config.use_power and config.use_log_fbank
                and jnp.dtype(dtype) == jnp.float32
            )
            fft_impl = "sig" if eligible else "rdft"
        if fft_impl not in ("rdft", "fft", "hp", "sig"):
            raise ValueError(
                "fft_impl must be 'auto', 'rdft', 'fft', 'hp' or 'sig'"
            )
        if fft_impl == "sig":
            from melspec_tpu.ops.mel_kernel import sig_geometry

            self._sig_geom = sig_geometry(config.frame_length_samples,
                                          config.frame_shift_samples)
            if self._sig_geom is None:
                raise ValueError(
                    "fft_impl='sig': no macro-row geometry for this "
                    "(frame_length, frame_shift)"
                )
            if not config.use_power:
                raise ValueError(
                    "fft_impl='sig' computes power spectra only "
                    "(use_power=False needs a per-bin sqrt)"
                )
            if not config.use_log_fbank:
                raise ValueError("fft_impl='sig' emits log-fbank only")
            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError("fft_impl='sig' is float32-only")
        self.config = config
        self.dtype = dtype
        self.fft_impl = fft_impl

        self.frame_len = config.frame_length_samples
        self.frame_shift = config.frame_shift_samples
        self.fft_size = config.fft_size
        self.fft_bins = self.fft_size // 2 + 1

        filters = kaldi_filterbank(
            config.sample_rate,
            self.fft_size,
            config.num_mel_bins,
            config.low_freq,
            config.effective_high_freq,
        )
        self._filters_np = filters
        self.filters_t = jnp.asarray(filters.T, dtype=dtype)
        self._window_np = povey(self.frame_len)
        self.window = jnp.asarray(self._window_np, dtype=dtype)
        if fft_impl == "sig":
            # Fold the ENTIRE per-frame preprocessing into the spectral
            # matrices — all of it is linear in the frame: DC removal is
            # (I - 11^T/L), in-frame preemphasis is the bidiagonal
            # (I - p*S), and the window is a diagonal. The cross-frame
            # first-sample term (src/fbank.rs:174-180) is spectrally
            # irrelevant because the Povey window has w[0] == 0 exactly,
            # so the fold is exact, not an approximation.
            from melspec_tpu.ops.mel_kernel import (_sig_frontend_matrices,
                                                    bf2_stack)

            L = self.frame_len
            B = kaldi_preproc_matrix(L, float(config.preemphasis))
            # the generic builder folds window + preproc into the
            # spectral matrices and (auto) picks the N-packed column
            # layout for this 512-point head — 512 lanes instead of 768
            m_big, pair_i, mt, _, _, _, npack = _sig_frontend_matrices(
                self.fft_size, self.fft_bins, self._window_np, filters,
                ks=3, km=3, cutoff=2, pack=L, preproc=B,
            )
            self._sig_m_big, self._sig_pair_i = m_big, pair_i
            self._sig_npack = npack
            self._sig_mt = bf2_stack(mt)

    @property
    def dense_filterbank(self) -> np.ndarray:
        """Dense float64 Kaldi filterbank (reference ``src/fbank.rs:243-246``)."""
        return self._filters_np

    def num_frames(self, sample_len: int) -> int:
        return framing.num_frames_batch(sample_len, self.frame_len, self.frame_shift)

    @functools.partial(jax.jit, static_argnums=0)
    def _compute_jit(self, samples: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = samples.astype(self.dtype)
        n = x.shape[-1]
        nf = self.num_frames(n)

        if self.fft_impl == "sig":
            # fused signal-input Pallas kernel: the [nf, frame_len] tensor
            # is never materialized; DC removal + preemphasis + Povey
            # window are pre-folded into the kernel's spectral matrices
            # (exactly — see __init__), ln(max(., floor)) in-kernel, CMN
            # fuses behind the output.
            from melspec_tpu.ops.mel_kernel import _pallas_sig_mel

            floor = cfg.energy_floor if cfg.energy_floor > 0.0 else F32_EPSILON
            lead = x.shape[:-1]
            x2 = x.reshape((-1, n)).astype(jnp.float32)
            row_w, phases, rows_tile = self._sig_geom
            feats = _pallas_sig_mel(
                x2, self._sig_m_big, self._sig_mt,
                interpret=jax.default_backend() not in ("tpu", "gpu"),
                ks=3, pair_i=self._sig_pair_i, n_frames=nf,
                pack=self.frame_len, npack=self._sig_npack,
                mel_precision="bf2",
                out_mode="ln_floor", guard=float(floor),
                n_mels_out=cfg.num_mel_bins, row_w=row_w, phases=phases,
                rows_tile=rows_tile,
            ).reshape(lead + (nf, cfg.num_mel_bins)).astype(self.dtype)
            if cfg.apply_cmn:
                feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
            return feats

        frames = framing.frame_signal(x, self.frame_len, self.frame_shift, nf)
        mean = jnp.mean(frames, axis=-1, keepdims=True)
        d = frames - mean  # DC removal, [..., nf, frame_len]

        if cfg.preemphasis > 0.0:
            p = jnp.asarray(cfg.preemphasis, self.dtype)
            # in-frame: y[i] = d[i] - p*d[i-1]
            shifted = jnp.concatenate([d[..., :1], d[..., :-1]], axis=-1)
            y = d - p * shifted
            # first sample: frame k>0 uses samples[start-1] re-centered with
            # frame k's mean; frame 0 keeps d[0] untouched.
            prev_sample = x[..., self.frame_shift - 1 :: self.frame_shift]
            prev_sample = prev_sample[..., : nf - 1]  # sample before frame k>=1
            first = d[..., 1:, 0] - p * (prev_sample - mean[..., 1:, 0])
            first = jnp.concatenate([d[..., :1, 0], first], axis=-1)
            y = y.at[..., 0].set(first)
        else:
            y = d

        if self.fft_impl == "hp":
            from melspec_tpu.ops.hp_dft import hp_rdft_power_windowed

            power = hp_rdft_power_windowed(
                y.astype(jnp.float32), self._window_np, self.fft_size,
                self.fft_bins,
            ).astype(self.dtype)
            if not cfg.use_power:
                power = jnp.sqrt(power)
            energy = jnp.matmul(power, self.filters_t,
                                preferred_element_type=self.dtype,
                                precision=jax.lax.Precision.HIGHEST)
            floor = cfg.energy_floor if cfg.energy_floor > 0.0 else F32_EPSILON
            energy = jnp.maximum(energy, jnp.asarray(floor, self.dtype))
            from melspec_tpu.ops.fastmath import ln_best

            feats = ln_best(energy, self.dtype) if cfg.use_log_fbank else energy
            if cfg.apply_cmn:
                feats = feats - jnp.mean(feats, axis=-2, keepdims=True)
            return feats

        xw = y * self.window
        # zero-pad to fft_size happens implicitly: the rDFT matrices are
        # evaluated only over the first frame_len samples (tail is zero).
        if self.fft_impl == "rdft":
            cos_m, msin_m = dft.rdft_matrices(self.fft_size, self.fft_bins)
            cos_m = jnp.asarray(cos_m[: self.frame_len], dtype=self.dtype)
            msin_m = jnp.asarray(msin_m[: self.frame_len], dtype=self.dtype)
            re = jnp.matmul(xw, cos_m, precision=jax.lax.Precision.HIGHEST)
            im = jnp.matmul(xw, msin_m, precision=jax.lax.Precision.HIGHEST)
            power = re * re + im * im
        else:
            pad = self.fft_size - self.frame_len
            xp = jnp.pad(xw, [(0, 0)] * (xw.ndim - 1) + [(0, pad)])
            spec = jnp.fft.rfft(xp, axis=-1)
            power = (jnp.real(spec) ** 2 + jnp.imag(spec) ** 2).astype(self.dtype)

        if not cfg.use_power:
            power = jnp.sqrt(power)

        energy = jnp.matmul(power, self.filters_t, preferred_element_type=self.dtype,
                            precision=jax.lax.Precision.HIGHEST)
        floor = cfg.energy_floor if cfg.energy_floor > 0.0 else F32_EPSILON
        energy = jnp.maximum(energy, jnp.asarray(floor, self.dtype))
        from melspec_tpu.ops.fastmath import ln_best

        feats = ln_best(energy, self.dtype) if cfg.use_log_fbank else energy

        if cfg.apply_cmn:
            feats = feats - jnp.mean(feats, axis=-2, keepdims=True)

        return feats  # [..., nf, num_mel_bins]

    def compute(self, samples, key: Optional[jax.Array] = None) -> jnp.ndarray:
        samples = jnp.asarray(samples)
        if self.num_frames(samples.shape[-1]) == 0:
            return jnp.zeros(
                samples.shape[:-1] + (0, self.config.num_mel_bins), dtype=self.dtype
            )
        if self.config.dither > 0.0 and key is not None:
            noise = jax.random.normal(key, samples.shape, dtype=self.dtype)
            samples = samples + self.config.dither * noise
        return self._compute_jit(samples)
