"""Filterbank construction parity vs the reference's checked-in fixtures.

Mirrors the reference's unit tests (``src/mel.rs:765-911``,
``src/fbank.rs:354-437``): librosa-carried values, whisper/NeMo npz goldens
at 1e-7, sparse-view introspection, Kaldi mel-scale round trips.
"""

import numpy as np
import pytest

from melspec_tpu.ops.filterbank import (
    SparseFilterbankView,
    fft_frequencies,
    hz_to_mel,
    kaldi_filterbank,
    kaldi_hz_to_mel,
    kaldi_mel_to_hz,
    mel_filterbank,
    mel_frequencies,
    mel_to_hz,
    mels_to_hz,
)


def test_hz_to_mel():
    assert abs(hz_to_mel(60.0) - 0.9) < 0.001


def test_mel_to_hz():
    assert mel_to_hz(3.0) == 200.0


def test_mels_to_hz():
    got = mels_to_hz(np.array([1.0, 2.0, 3.0, 4.0, 5.0]))
    want = np.array([66.667, 133.333, 200.0, 266.667, 333.333])
    np.testing.assert_allclose(got, want, atol=0.001)


def test_mel_frequencies():
    # librosa.mel_frequencies(n_mels=40) in-line example
    want = np.array([
        0., 85.317, 170.635, 255.952, 341.269, 426.586, 511.904, 597.221,
        682.538, 767.855, 853.173, 938.49, 1024.856, 1119.114, 1222.042,
        1334.436, 1457.167, 1591.187, 1737.532, 1897.337, 2071.84, 2262.393,
        2470.47, 2697.686, 2945.799, 3216.731, 3512.582, 3835.643, 4188.417,
        4573.636, 4994.285, 5453.621, 5955.205, 6502.92, 7101.009, 7754.107,
        8467.272, 9246.028, 10096.408, 11025.,
    ])
    got = mel_frequencies(40, 0.0, 11025.0)
    np.testing.assert_allclose(got, want, atol=0.005)


def test_fft_frequencies():
    want = np.array([
        0., 1378.125, 2756.25, 4134.375, 5512.5, 6890.625, 8268.75,
        9646.875, 11025.,
    ])
    np.testing.assert_allclose(fft_frequencies(22050.0, 16), want, atol=0.001)


def test_whisper_filterbank_vs_golden(testdata):
    with np.load(testdata / "mel_filters.npz") as npz:
        want = npz[npz.files[0]].astype(np.float64)
    got = mel_filterbank(16000.0, 400, 80)
    assert got.shape == (80, 201)
    assert want.shape == (80, 201)
    assert np.max(np.abs(got - want)) <= 1.0e-7


def test_nemo_filterbank_vs_golden(testdata):
    with np.load(testdata / "nemo_mel_filters.npz") as npz:
        want = npz["banks"][0].astype(np.float64)  # [1, 80, 257] -> [80, 257]
    got = mel_filterbank(16000.0, 512, 80)
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) <= 1.0e-7


def test_sparse_view_matches_dense_projection():
    dense = mel_filterbank(16000.0, 512, 128, f_min=0.0, f_max=8000.0)
    view = SparseFilterbankView.from_dense(dense)
    power = np.abs(np.sin((np.arange(257, dtype=np.float64) + 1.0) * 0.001))

    for mel_idx in range(128):
        sparse_sum = sum(w * power[b] for b, w in view.weights_for_mel(mel_idx))
        dense_sum = float(dense[mel_idx] @ power)
        assert abs(sparse_sum - dense_sum) <= 1e-12

    assert view.non_zero_weights < view.dense_weights / 10
    assert view.n_mels == 128
    assert view.fft_bins == 257


def test_kaldi_mel_scale():
    assert abs(kaldi_hz_to_mel(0.0)) < 1e-6
    assert abs(kaldi_hz_to_mel(1000.0) - 999.98) < 1.0
    assert abs(kaldi_hz_to_mel(8000.0) - 2840.0) < 1.0
    for hz in [0.0, 500.0, 1000.0, 4000.0, 8000.0]:
        assert abs(kaldi_mel_to_hz(kaldi_hz_to_mel(hz)) - hz) < 1e-6


def test_kaldi_filterbank_shape_and_sparsity():
    fb = kaldi_filterbank(16000.0, 512, 80, low_freq=20.0)
    assert fb.shape == (80, 257)
    view = SparseFilterbankView.from_dense(fb)
    assert view.non_zero_weights < view.dense_weights / 10
    # not area-normalized: peak weights should be near 1 for wide filters
    assert fb.max() <= 1.0 + 1e-12
