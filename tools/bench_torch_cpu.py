#!/usr/bin/env python
"""Whisper log-mel throughput: this framework (CPU jax) vs a torch CPU
implementation — the same comparison methodology the reference uses
against a TorchScript-traced frontend (its README reports 4699x RT for
itself vs 4902x for TorchScript on an M1 for the Parakeet config).

    python tools/bench_torch_cpu.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def bench(fn, arg, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(arg)
    _ = np.asarray(out)  # sync: warmup work must not bleed into the timing
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(arg)
    _ = np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import torch

    from melspec_tpu.ops.filterbank import mel_filterbank
    from melspec_tpu.ops.spectrogram import WhisperMelPipeline
    from melspec_tpu.ops.windows import hann_periodic

    sr, fft, hop, n_mels = 16000, 400, 160, 80
    rng = np.random.default_rng(0)
    clip = (rng.normal(size=11 * sr) * 0.2).astype(np.float32)  # JFK length
    audio_s = len(clip) / sr

    # --- ours (jax CPU, f32; auto impl picks the real FFT on CPU) ---
    pipe = WhisperMelPipeline(fft, hop, n_mels, float(sr), dtype=jnp.float32)
    clip_j = jnp.asarray(clip)
    ours = bench(lambda x: pipe.mel_batch(x), clip_j)

    # --- torch CPU ---
    filters_t = torch.from_numpy(
        mel_filterbank(sr, fft, n_mels)[:, : fft // 2].astype(np.float32)
    )
    window_t = torch.from_numpy(hann_periodic(fft).astype(np.float32))
    clip_t = torch.from_numpy(clip)

    def torch_mel(x):
        spec = torch.stft(x, fft, hop_length=hop, win_length=fft,
                          window=window_t, center=False,
                          return_complex=True)
        power = spec[: fft // 2].abs() ** 2  # [bins, frames]
        energy = filters_t @ power
        log_mel = torch.log10(torch.clamp(energy, min=1e-10))
        mmax = log_mel.amax(dim=0, keepdim=True) - 8.0
        return (torch.maximum(log_mel, mmax) + 4.0) / 4.0

    with torch.no_grad():
        theirs = bench(lambda x: torch_mel(x), clip_t)

    print(f"11 s clip, whisper 80-mel, single CPU core-ish:")
    print(f"  melspec_tpu (jax cpu): {ours*1e3:7.2f} ms -> {audio_s/ours:,.0f}x RT")
    print(f"  torch.stft  (cpu):     {theirs*1e3:7.2f} ms -> {audio_s/theirs:,.0f}x RT")
    print(f"  (reference crate publishes 476x RT on an M1 Pro core; its "
          f"TorchScript comparison ran 4902x for the Parakeet config)")


if __name__ == "__main__":
    main()
