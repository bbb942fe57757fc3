"""Multi-head signal-input kernel: one spectral pass feeding whisper mel
and Kaldi fbank heads must reproduce the single-head kernels exactly
(same matrices, same slice cascade — the only difference is the N-concat
of the spectral matrices, which changes no arithmetic)."""

import numpy as np
import pytest
import jax.numpy as jnp

from melspec_tpu.config import DetectionSettings, FbankConfig, MelConfig
from melspec_tpu.ops.fbank import Fbank
from melspec_tpu.ops.mel_kernel import whisper_mel_sig
from melspec_tpu.ops.sig_multihead import WhisperKaldiFused


@pytest.fixture(scope="module")
def fused():
    return WhisperKaldiFused(interpret=True)


def test_fused_matches_single_head_kernels(fused, jfk_samples):
    x = np.asarray(jfk_samples)[: 16000 * 6][None]
    mel, fbank = fused.compute(jnp.asarray(x))

    want_mel = whisper_mel_sig(x, 400, 160, 80, 16000.0, interpret=True)
    kaldi = Fbank(FbankConfig(apply_cmn=True), fft_impl="sig")
    # Fbank's sig route is gated on the backend; force interpret via its
    # internal call by comparing against the XLA route instead
    want_fbank = kaldi.compute(x)

    np.testing.assert_array_equal(np.asarray(mel), np.asarray(want_mel))
    assert mel.shape == (1, 598, 80)
    assert fbank.shape == want_fbank.shape
    # sig vs XLA fbank route: same math, different pass structure
    assert np.abs(np.asarray(fbank) - np.asarray(want_fbank)).max() < 2e-4


def test_fused_with_vad_matches_classify(fused, jfk_samples):
    from melspec_tpu.ops.vad import classify_columns

    settings = DetectionSettings()
    x = np.asarray(jfk_samples)[None]
    mel, fbank, raw = fused.compute_with_vad(jnp.asarray(x), settings)
    want = classify_columns(jnp.swapaxes(jnp.asarray(mel), -1, -2),
                            settings)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(want))
    assert fbank.shape == mel.shape


def test_fused_rejects_mismatched_grids():
    with pytest.raises(ValueError, match="one frame grid"):
        WhisperKaldiFused(MelConfig(fft_size=512, hop_size=160),
                          FbankConfig(), interpret=True)


def test_fused_flat_path_batch8_matches_single_heads(jfk_samples):
    """b=8 with T % 128 == 0 auto-selects the FLAT input path (and the
    VAD epilogue forces its 128-frame tile); in CI this was otherwise
    only exercised in rows mode (b=1) plus the on-chip compiled gate.
    The mel head must equal the single-head kernel on the same batch and
    the raw VAD columns must equal classify_columns on the mel image."""
    from melspec_tpu.ops.mel_kernel import (_sig_flat_geometry,
                                            whisper_mel_sig)
    from melspec_tpu.ops.vad import classify_columns

    t = 16000
    assert _sig_flat_geometry(160, 512, 0, 8, t, epilogue=True) is not None
    base = np.asarray(jfk_samples)[:t]
    x = np.stack([np.roll(base, 997 * i) for i in range(8)]).astype(
        np.float32)

    fused = WhisperKaldiFused(interpret=True)
    settings = DetectionSettings()
    mel, fbank, raw = fused.compute_with_vad(jnp.asarray(x), settings)

    want_mel = whisper_mel_sig(x, 400, 160, 80, 16000.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(want_mel))
    want_raw = classify_columns(jnp.swapaxes(jnp.asarray(mel), -1, -2),
                                settings)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(want_raw))
    assert fbank.shape == mel.shape


def test_fused_ragged_batch_autopads_into_flat(jfk_samples):
    """Round-5 eligibility pad on the multihead route: b=5 / T ragged
    must zero-pad into the FLAT path (not silently ride rows mode) and
    slice every head's output back to the real batch, equal to the
    well-aligned call on the same real clips."""
    t = 15900  # T % 128 != 0, b % 8 != 0
    base = np.asarray(jfk_samples)[:t]
    x = np.stack([np.roll(base, 997 * i) for i in range(5)]).astype(
        np.float32)

    fused = WhisperKaldiFused(interpret=True)
    settings = DetectionSettings()
    mel, fbank, raw = fused.compute_with_vad(jnp.asarray(x), settings)
    assert mel.shape[0] == fbank.shape[0] == raw.shape[0] == 5

    want_mel = whisper_mel_sig(x, 400, 160, 80, 16000.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(want_mel))
    mel2, fbank2 = fused.compute(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(mel2), np.asarray(mel))
    # the VAD-epilogue kernel variant tiles frames differently, which
    # perturbs the fbank head's f32 dot at ~1e-6 (pre-existing between
    # the two routes, independent of the pad); the established fbank
    # differential bar is 2e-4 (test_fused_matches_single_head_kernels)
    assert np.abs(np.asarray(fbank2) - np.asarray(fbank)).max() < 1e-5
    want_fbank = Fbank(FbankConfig(apply_cmn=True), fft_impl="sig").compute(x)
    assert np.abs(np.asarray(fbank) - np.asarray(want_fbank)).max() < 2e-4


def test_trihead_fused_matches_singles(jfk_samples):
    """WhisperKaldiNemoFused (three heads over one DMA + slice cascade,
    VERDICT r4 item 5): the whisper head must be BIT-EXACT with the
    single-head kernel; the kaldi head holds the pair kernel's 2e-4
    cross-route bar; the NeMo head — center + cross-frame preemphasis
    folded as a banded rectangular preproc over the raw window — must
    land in the standalone sig route's accuracy class vs the f64
    reference (measured: fold 7.4e-5 vs standalone sig 6.9e-5 on JFK),
    and the fused Sobel activity must equal classify_columns."""
    import jax.numpy as _jnp

    from melspec_tpu.ops.batch_logmel import BatchLogMel
    from melspec_tpu.ops.sig_multihead import WhisperKaldiNemoFused
    from melspec_tpu.ops.vad import classify_columns

    x = np.asarray(jfk_samples)[: 16000 * 4][None]
    tri = WhisperKaldiNemoFused(interpret=True)
    settings = DetectionSettings()
    mel, fbank, nemo, raw = tri.compute_with_vad(jnp.asarray(x), settings)

    want_mel = whisper_mel_sig(x, 400, 160, 80, 16000.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(mel), np.asarray(want_mel))

    want_fbank = Fbank(FbankConfig(apply_cmn=True),
                       fft_impl="sig").compute(x)
    assert np.abs(np.asarray(fbank) - np.asarray(want_fbank)).max() < 2e-4

    f64 = BatchLogMel(dtype=_jnp.float64, fft_impl="rdft").compute(
        x.astype(np.float64))
    assert nemo.shape == f64.shape
    assert np.abs(np.asarray(nemo) - np.asarray(f64)).max() < 2e-4

    want_raw = classify_columns(jnp.swapaxes(jnp.asarray(mel), -1, -2),
                                settings)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(want_raw))

    # compute() (no VAD) agrees with itself across the epilogue variants
    mel2, fbank2, nemo2 = tri.compute(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(mel2), np.asarray(mel))
    assert np.abs(np.asarray(nemo2) - np.asarray(nemo)).max() < 1e-5
