"""README quick-start contract — the reference pins its documented API the
same way (``tests/readme_examples.rs``)."""

import numpy as np
import pytest

from melspec_tpu.prelude import *  # noqa: F403 — the point is the prelude
from melspec_tpu.config import MelConfig, DetectionSettings, VadFrameTiming


def test_quick_start_cpu_mel_pipeline_runs():
    samples = np.zeros(16000, dtype=np.float32)
    mel_frames = compute_mel_spectrogram(samples, 400, 160, 80, 16000.0)  # noqa: F405
    assert len(mel_frames) > 0
    assert mel_frames.shape[1] == 80


def test_fbank_example_runs():
    fbank = Fbank(FbankConfig())  # noqa: F405
    features = fbank.compute(np.zeros(16000, dtype=np.float32))
    assert features.shape[1] == 80
    assert features.shape[0] > 0


def test_mel_and_stft_example_runs():
    filters = mel(16000.0, 400, 80, None, None, False, True)  # noqa: F405
    assert filters.shape == (80, 201)

    stream = StreamingMel(MelConfig(400, 160, 80, 16000.0))  # noqa: F405
    state = stream.init()
    mel_frame = None
    for _ in range(3):
        state, out = stream.push(state, np.zeros(160, dtype=np.float32))
        if out is not None:
            mel_frame = out
    assert mel_frame is not None and mel_frame.shape == (80,)


def test_tga_example_runs(tmp_path):
    n_mels = 80
    frame = (np.arange(n_mels, dtype=np.float64) / n_mels).reshape(n_mels, 1)
    interleaved = interleave_frames([frame], False, 2)  # noqa: F405
    path = tmp_path / "readme.tga"
    save_tga_8bit(interleaved, n_mels, path)  # noqa: F405
    loaded = load_tga_8bit(path)  # noqa: F405
    assert loaded.shape == interleaved.shape


def test_vad_timestamp_example_runs():
    settings = DetectionSettings()
    vad = VoiceActivityDetector(settings, VadFrameTiming(400, 160, 16000.0))  # noqa: F405
    frame = np.zeros((80, 1))
    for _ in range(settings.min_x):
        vad.add_activity(frame)
    activity = vad.add_activity(frame)
    assert activity is not None and activity.timestamps is not None


def test_direct_power_to_mel_example_runs():
    """The reference's direct FFT->mel path (``MelSpectrogram::add`` on a
    hand-built FFT frame): here, project a power spectrum directly."""
    import jax.numpy as jnp
    from melspec_tpu.ops.spectrogram import WhisperMelPipeline, whisper_norm
    from melspec_tpu.ops.spectrogram import log_mel_from_power

    pipe = WhisperMelPipeline(400, 160, 80, 16000.0)
    power = jnp.ones((1, 200), dtype=jnp.float32)
    log_mel = log_mel_from_power(power, pipe.filters_t)
    out = whisper_norm(log_mel, axis=-1)
    assert out.shape == (1, 80)


def test_pallas_kernel_example_runs():
    out = whisper_mel_pallas(  # noqa: F405
        np.zeros(16000, dtype=np.float32), 400, 160, 80, 16000.0,
        interpret=True,
    )
    assert out.shape == (98, 80)


def test_profiling_utils():
    from melspec_tpu.utils.profiling import Timer, benchmark, rtfx

    with Timer() as t:
        sum(range(1000))
    assert t.seconds >= 0
    assert rtfx(10.0, 0.01) == 1000.0
    dt = benchmark(lambda x: x + 1, 1, iters=2, warmup=1)
    assert dt >= 0
