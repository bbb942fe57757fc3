"""SpeechToMel: the embeddable streaming speech-frontend service.

Counterpart of the reference's wasm-bindgen binding (``src/wasm.rs:10-146``)
— one object composing STFT + mel + VAD + 8-bit quantization for host
applications (websocket services, audio workers, RPC frontends):

- holds a full-resolution mel projection for output and a quarter-resolution
  one for the VAD (``src/wasm.rs:72-74``);
- ``add(samples, vad=True)`` accumulates PCM to hop size and, once the
  overlap window fills, emits a dict shaped like the reference's JS object
  (``src/wasm.rs:95-145``): ``{ok, len, frame (uint8), min, max, idx, ms,
  va}``;
- the emitted ``frame`` is the *unnormalized* log10 mel column, quantized —
  exactly what the reference ships over its SharedArrayBuffer ring (the
  normalized variant feeds only the VAD).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.config import DetectionSettings
from melspec_tpu.ops import dft
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.ops.quant import quantize
from melspec_tpu.ops.windows import hann_periodic
from melspec_tpu.streaming.vad import VoiceActivityDetector
from melspec_tpu.utils.timing import duration_ms_for_n_frames


class SpeechToMel:
    def __init__(
        self,
        fft_size: int = 400,
        hop_size: int = 160,
        sampling_rate: float = 16000.0,
        n_mels: int = 80,
        settings: DetectionSettings = DetectionSettings(
            min_energy=1.0, min_y=3, min_x=3, min_mel=0
        ),
        dtype=jnp.float32,
    ):
        self.fft_size = fft_size
        self.hop_size = hop_size
        self.sampling_rate = sampling_rate
        self.n_mels = n_mels
        self.dtype = dtype

        half = fft_size // 2
        filters = mel_filterbank(sampling_rate, fft_size, n_mels)
        filters_vad = mel_filterbank(sampling_rate, fft_size, n_mels // 4)
        self._filters_t = jnp.asarray(filters[:, :half].T, dtype)
        self._filters_vad_t = jnp.asarray(filters_vad[:, :half].T, dtype)
        self._window = jnp.asarray(hann_periodic(fft_size), dtype)
        cos_m, msin_m = dft.rdft_matrices(fft_size, half)
        self._cos = jnp.asarray(cos_m, dtype)
        self._msin = jnp.asarray(msin_m, dtype)

        self._vad = VoiceActivityDetector(settings)
        self._hop_buf = np.zeros(fft_size, dtype=np.float32)
        self._seen = 0
        self._accumulated = np.zeros(0, dtype=np.float32)
        self._idx = 0

        self._step = jax.jit(self._step_impl, static_argnums=1)

    def _step_impl(self, buf: jnp.ndarray, with_vad: bool):
        from melspec_tpu.ops.spectrogram import (log_mel_from_power,
                                                  whisper_norm)

        hp = jax.lax.Precision.HIGHEST
        xw = buf.astype(self.dtype) * self._window
        re = jnp.matmul(xw, self._cos, precision=hp)
        im = jnp.matmul(xw, self._msin, precision=hp)
        power = re * re + im * im

        log_mel = log_mel_from_power(power, self._filters_t, self.dtype)
        if not with_vad:
            # the quarter-filterbank projection is dead work when the
            # caller disabled VAD for this frame
            return (log_mel,)
        log_vad = log_mel_from_power(power, self._filters_vad_t, self.dtype)
        return log_mel, whisper_norm(log_vad)

    @property
    def pending(self) -> int:
        """Complete hops already buffered, each consumable by one
        ``get()`` call. Like the reference's wasm binding, each call emits
        at most ONE frame — services pushing blocks larger than hop_size
        drain the backlog with ``while s.pending: s.get()``."""
        return int(self._accumulated.size) // self.hop_size

    def add(self, samples: np.ndarray, vad: bool = True) -> Dict:
        """Push PCM samples; returns the reference's result-object shape
        with ``ok=False`` until a full hop + window are available. One hop
        is consumed per call (the reference's cadence, src/wasm.rs:95-145)
        — check ``pending`` and call ``get()`` to drain a backlog."""
        result: Dict = {"ok": False}
        self._accumulated = np.concatenate(
            [self._accumulated, np.asarray(samples, np.float32)]
        )
        if self._accumulated.size < self.hop_size:
            return result

        chunk = self._accumulated[: self.hop_size]
        self._accumulated = self._accumulated[self.hop_size :]
        result["len"] = int(chunk.size)

        self._hop_buf = np.concatenate([self._hop_buf[self.hop_size :], chunk])
        self._seen += chunk.size
        if self._seen >= self.fft_size:
            out = self._step(jnp.asarray(self._hop_buf), vad)
            log_mel = np.asarray(out[0], np.float32)
            quantized, qr = quantize(log_mel)
            result.update(
                ok=True,
                frame=quantized,
                min=qr.min,
                max=qr.max,
                idx=self._idx,
                ms=duration_ms_for_n_frames(
                    self.hop_size, self.sampling_rate, self._idx
                ),
            )
            if vad:
                decision = self._vad.add(np.asarray(out[1], np.float64))
                if decision is not None:
                    result["va"] = decision
        self._idx += 1  # the reference advances idx per consumed hop
        return result

    def get(self, vad: bool = True) -> Dict:
        """Flush call with no new samples (reference ``src/wasm.rs:88-92``).
        ``vad`` defaults to True so drained frames keep feeding the
        detector — a vad=False drain would leave its sliding window
        temporally discontinuous and its frame_index out of sync."""
        return self.add(np.zeros(0, dtype=np.float32), vad=vad)
