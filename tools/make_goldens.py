#!/usr/bin/env python
"""Golden-fixture generator (the analogue of the reference's
``testdata/kaldi.py`` / ``testdata/nemo_filterbank.py`` scripts).

Generates this repo's self-contained synthetic goldens in ``testdata/``
from the float64 reference paths: a deterministic multi-tone test signal,
its whisper mel (streaming semantics), Kaldi fbank, NeMo log-mel, the
filterbank matrices, and the VAD decision sequence. Regenerate with:

    python tools/make_goldens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from melspec_tpu.config import BatchLogMelConfig, DetectionSettings, FbankConfig
from melspec_tpu.ops.batch_logmel import BatchLogMel
from melspec_tpu.ops.fbank import Fbank
from melspec_tpu.ops.filterbank import kaldi_filterbank, mel_filterbank
from melspec_tpu.ops.spectrogram import compute_streaming_mel
from melspec_tpu.ops.vad import streaming_decision_fields

OUT = Path(__file__).resolve().parents[1] / "testdata"


def test_signal(seconds: float = 2.0, sr: int = 16000) -> np.ndarray:
    """Deterministic speech-like signal: tone bursts + chirp + noise floor,
    with silent gaps (so the VAD golden has both classes)."""
    t = np.arange(int(seconds * sr)) / sr
    sig = np.zeros_like(t)
    # voiced-ish bursts: harmonic stacks with onsets/offsets
    for start, dur, f0 in [(0.1, 0.5, 140.0), (0.9, 0.4, 200.0), (1.5, 0.3, 110.0)]:
        seg = (t >= start) & (t < start + dur)
        env = np.sin(np.pi * (t - start) / dur) ** 2
        for harmonic in range(1, 6):
            sig += np.where(
                seg, env * np.sin(2 * np.pi * f0 * harmonic * t) / harmonic, 0.0
            )
    # a chirp crossing the mel range: instantaneous frequency
    # 300 + 8000*(t-0.65) over the active window, i.e. 300 Hz -> 1.9 kHz
    # (the old absolute-t phase only swept ~5.5-7.1 kHz, never exercising
    # the low/mid mel bands)
    chirp_seg = (t >= 0.65) & (t < 0.85)
    tc = t - 0.65
    sig += np.where(chirp_seg,
                    0.5 * np.sin(2 * np.pi * (300 + 4000 * tc) * tc), 0.0)
    rng = np.random.default_rng(1234)
    sig += 1e-4 * rng.standard_normal(t.shape)
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)


def main() -> None:
    OUT.mkdir(exist_ok=True)
    sig = test_signal()
    np.save(OUT / "synthetic_signal.npy", sig)

    mel = compute_streaming_mel(sig, 400, 160, 80, 16000.0, dtype=jnp.float64)
    np.save(OUT / "synthetic_whisper_mel_golden.npy", mel.astype(np.float32))

    # whisper large-v3's 128-mel frontend (same 400/160 grid; n_mels is
    # the only delta) — the named config melspec_tpu.config.WHISPER_LARGE_V3
    mel128 = compute_streaming_mel(sig, 400, 160, 128, 16000.0,
                                   dtype=jnp.float64)
    np.save(OUT / "synthetic_whisper128_golden.npy",
            mel128.astype(np.float32))

    fbank = np.asarray(Fbank(FbankConfig(), dtype=jnp.float64).compute(sig))
    np.save(OUT / "synthetic_fbank_golden.npy", fbank.astype(np.float32))

    nemo = np.asarray(
        BatchLogMel(BatchLogMelConfig(n_mels=128, preemphasis=0.97,
                                      normalize_per_feature=True),
                    dtype=jnp.float64).compute(sig)
    )
    np.save(OUT / "synthetic_nemo_golden.npy", nemo.astype(np.float32))

    np.savez(
        OUT / "filterbanks_golden.npz",
        whisper_80_400=mel_filterbank(16000.0, 400, 80).astype(np.float32),
        whisper_128_400=mel_filterbank(16000.0, 400, 128).astype(np.float32),
        slaney_80_512=mel_filterbank(16000.0, 512, 80).astype(np.float32),
        kaldi_80_512=kaldi_filterbank(16000.0, 512, 80, 20.0).astype(np.float32),
    )

    fields = streaming_decision_fields(
        mel.astype(np.float64), DetectionSettings()
    )
    np.savez(
        OUT / "synthetic_vad_golden.npz",
        active=fields["active"],
        leading=fields["leading"],
        active_columns=fields["active_columns"],
        confidence=fields["confidence"],
    )

    for f in sorted(OUT.iterdir()):
        print(f"{f.name}: {f.stat().st_size} bytes")


if __name__ == "__main__":
    main()
