"""Direct FFT-frame API parity: StreamingStft + MelProjection compose to
the exact same output as the fused streaming pipeline, and the README
direct-FFT contract holds (reference ``tests/readme_examples.rs:89-99``,
``src/mel.rs:13-32,437-442``)."""

import numpy as np
import jax.numpy as jnp

from melspec_tpu.ops.spectrogram import (
    MelProjection,
    compute_streaming_mel,
    log_mel_spectrogram,
    norm_mel,
    norm_mel_vec,
)
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.streaming.stft import StreamingStft


def test_direct_fft_to_mel_contract():
    proj = MelProjection(400, 16000.0, 80)
    fft_input = np.ones(400, dtype=np.complex128)
    out = proj.add(fft_input)
    assert out.shape == (80, 1)


def test_log_mel_spectrogram_zeroes_high_bins():
    filters = mel_filterbank(16000.0, 400, 80)
    fft = np.zeros(400, dtype=np.complex128)
    fft[250] = 1000.0  # bin >= 200 must not contribute
    out = log_mel_spectrogram(fft, filters)
    assert np.allclose(out, np.log10(1e-10))


def test_streaming_stft_plus_projection_equals_fused(jfk_samples):
    samples = jfk_samples[:16000]
    stft = StreamingStft(512, 160)
    proj = MelProjection(512, 16000.0, 80)
    cols = []
    for off in range(0, len(samples) - 159, 160):
        fft = stft.add(samples[off : off + 160])
        if fft is not None:
            cols.append(proj.add(fft))
    got = np.concatenate(cols, axis=1)
    want = compute_streaming_mel(samples, 512, 160, 80, 16000.0,
                                 dtype=jnp.float64)
    assert got.shape == want.shape
    # `want` is returned as float32; compare at float32 resolution
    assert np.abs(got - want).max() < 1e-6


def test_norm_aliases():
    x = np.linspace(-20.0, 0.0, 80)
    g = norm_mel(x)
    v = norm_mel_vec(x)
    assert float(np.max(np.asarray(g))) == 1.0
    assert v.dtype == np.float32
    np.testing.assert_allclose(np.asarray(g, np.float32), v, atol=1e-6)
