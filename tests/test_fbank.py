"""Kaldi fbank: differential test vs a naive per-frame numpy
reimplementation + the reference's golden/shape contract
(``src/fbank.rs:354-535``)."""

import numpy as np
import pytest
import jax.numpy as jnp

from melspec_tpu.config import FbankConfig
from melspec_tpu.ops.fbank import F32_EPSILON, Fbank
from melspec_tpu.ops.filterbank import kaldi_filterbank
from melspec_tpu.ops.windows import povey


def naive_fbank(samples: np.ndarray, cfg: FbankConfig) -> np.ndarray:
    """Obvious per-frame float64 reimplementation of the reference's compute
    loop (``src/fbank.rs:141-236``)."""
    frame_len = cfg.frame_length_samples
    shift = cfg.frame_shift_samples
    fft_size = cfg.fft_size
    if len(samples) < frame_len:
        return np.zeros((0, cfg.num_mel_bins), dtype=np.float32)
    nf = 1 + (len(samples) - frame_len) // shift
    window = povey(frame_len)
    filters = kaldi_filterbank(
        cfg.sample_rate, fft_size, cfg.num_mel_bins, cfg.low_freq,
        cfg.effective_high_freq,
    )
    out = np.zeros((nf, cfg.num_mel_bins))
    for k in range(nf):
        start = k * shift
        frame = samples[start : start + frame_len].astype(np.float64)
        mean = frame.mean()
        d = frame - mean
        if cfg.preemphasis > 0.0:
            y = d.copy()
            y[1:] = d[1:] - cfg.preemphasis * d[:-1]
            if start > 0:
                y[0] = d[0] - cfg.preemphasis * (samples[start - 1] - mean)
            d = y
        padded = np.zeros(fft_size)
        padded[:frame_len] = d * window
        spec = np.fft.rfft(padded)
        power = np.abs(spec) ** 2 if cfg.use_power else np.abs(spec)
        energy = filters @ power
        floor = cfg.energy_floor if cfg.energy_floor > 0.0 else F32_EPSILON
        energy = np.maximum(energy, floor)
        out[k] = np.log(energy) if cfg.use_log_fbank else energy
    if cfg.apply_cmn and nf > 0:
        out = out - out.mean(axis=0, keepdims=True)
    return out


@pytest.mark.parametrize(
    "cfg",
    [
        FbankConfig(),
        FbankConfig(apply_cmn=False),
        FbankConfig(preemphasis=0.0, use_power=False),
        FbankConfig(num_mel_bins=40, energy_floor=1e-6, use_log_fbank=False),
    ],
)
def test_differential_vs_naive(cfg):
    rng = np.random.default_rng(5)
    samples = (rng.normal(size=8000) * 0.3).astype(np.float32)
    want = naive_fbank(samples, cfg)
    got = np.asarray(Fbank(cfg, dtype=jnp.float64).compute(samples))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_config_defaults():
    cfg = FbankConfig()
    assert cfg.frame_length_samples == 400
    assert cfg.frame_shift_samples == 160
    assert cfg.fft_size == 512


def test_fbank_basic_shape():
    """README fbank contract (``tests/readme_examples.rs:21-30``)."""
    feats = Fbank(FbankConfig()).compute(np.zeros(16000, dtype=np.float32))
    assert feats.shape[1] == 80
    assert 90 < feats.shape[0] < 100  # 98 frames for 1 s


def test_too_short_input():
    feats = Fbank(FbankConfig()).compute(np.zeros(100, dtype=np.float32))
    assert feats.shape == (0, 80)


def test_fbank_vs_kaldi_golden(testdata, jfk_samples):
    """Mirror of the reference golden test (``src/fbank.rs:440-535``): frame
    count must match the kaldi_native_fbank golden; value closeness is
    informational there (their implementation is an approximation), so we
    gate at the deviation the reference itself exhibits."""
    with np.load(testdata / "kaldi_native_fbank_jfk.npz") as npz:
        golden = npz["features"]  # [80, frames]
    golden_t = golden.T
    computed = np.asarray(Fbank(FbankConfig()).compute(jfk_samples))
    assert computed.shape[0] == golden_t.shape[0], "frame count mismatch"
    assert np.isfinite(computed).all()
    variance = float((computed ** 2).mean())
    assert variance > 0.1
    # the reference keeps this informational because its implementation is
    # an admitted approximation; ours gates hard — measured max 0.0152 /
    # mean 0.0028 / corr 0.999999 against kaldi_native_fbank
    diff = np.abs(computed - golden_t)
    assert diff.max() < 0.05, f"max diff {diff.max()}"
    assert diff.mean() < 0.01, f"mean diff {diff.mean()}"
    corr = np.corrcoef(computed.ravel(), golden_t.ravel())[0, 1]
    assert corr > 0.9999


def test_hp_path_tightens_f32(jfk_samples):
    """hp halves the f32 deviation on JFK (max 3.7e-3 -> 1.4e-3; the
    residual is f32 preprocessing — DC removal/preemphasis — plus ln
    sensitivity in near-silent frames, not the DFT)."""
    f64 = np.asarray(Fbank(FbankConfig(), dtype=jnp.float64)
                     .compute(jfk_samples))
    f32 = np.asarray(Fbank(FbankConfig(), dtype=jnp.float32)
                     .compute(jfk_samples))
    hp = np.asarray(Fbank(FbankConfig(), dtype=jnp.float32, fft_impl="hp")
                    .compute(jfk_samples))
    assert np.abs(hp - f64).max() < 2e-3
    assert np.abs(hp - f64).mean() < np.abs(f32 - f64).mean()


def test_batched_matches_loop():
    cfg = FbankConfig()
    fb = Fbank(cfg, dtype=jnp.float64)
    rng = np.random.default_rng(9)
    batch = (rng.normal(size=(2, 4000)) * 0.3).astype(np.float32)
    got = np.asarray(fb.compute(batch))
    for i in range(2):
        np.testing.assert_allclose(got[i], np.asarray(fb.compute(batch[i])), atol=0)


def test_sig_impl_matches_reference_class(testdata):
    """fft_impl='sig' (fused kernel; DC removal + preemphasis + Povey
    window folded EXACTLY into the spectral matrices — exact because the
    Povey window zeroes the first sample, killing the only nonlinear-ish
    term, the cross-frame first sample) must match the rdft path's
    accuracy class vs float64, and hold the JFK golden gate."""
    import jax.numpy as jnp

    for cfg in [FbankConfig(), FbankConfig(apply_cmn=True),
                FbankConfig(preemphasis=0.0)]:
        rng = np.random.default_rng(7)
        x = (rng.normal(size=(2, 24000)) * 0.2).astype(np.float32)
        f64 = np.asarray(Fbank(cfg, dtype=jnp.float64).compute(x))
        sig = np.asarray(Fbank(cfg, fft_impl="sig").compute(x))
        rd = np.asarray(Fbank(cfg).compute(x))
        assert sig.shape == f64.shape
        assert np.abs(sig - f64).max() < np.abs(rd - f64).max() * 3 + 2e-5

    # the reference's own golden (hard-gated for the rdft path at
    # max 0.0152): the fused kernel must hold the same gate
    with np.load(testdata / "kaldi_native_fbank_jfk.npz") as npz:
        golden = npz["features"].T  # [frames, 80]
    from melspec_tpu.io.wav import read_wav_f32le

    samples = read_wav_f32le(testdata / "jfk_f32le.wav")
    feats = np.asarray(Fbank(FbankConfig(), fft_impl="sig").compute(samples))
    assert feats.shape == golden.shape
    assert np.abs(feats - golden).max() < 0.016


def test_sig_impl_validation():
    import jax.numpy as jnp
    import pytest

    # generalized geometry: a 20 ms shift (320 samples) now rides the
    # kernel; parity vs the rdft path
    cfg20 = FbankConfig(frame_shift_ms=20.0)
    rng = np.random.default_rng(3)
    x = (rng.normal(size=20000) * 0.2).astype(np.float32)
    a = np.asarray(Fbank(cfg20, fft_impl="sig").compute(x))
    b = np.asarray(Fbank(cfg20, fft_impl="rdft").compute(x))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4)
    with pytest.raises(ValueError):
        Fbank(FbankConfig(use_power=False), fft_impl="sig")
    with pytest.raises(ValueError):
        Fbank(FbankConfig(), dtype=jnp.float64, fft_impl="sig")


def test_sig_builder_preproc_matches_manual_fold():
    """The generic _sig_frontend_matrices(preproc=B) must reproduce the
    hand-rolled DC-removal+preemphasis fold bit-for-bit in BOTH column
    layouts (the class uses packed; tools/bench_npack.py uses split)."""
    from melspec_tpu.ops import dft as _dft
    from melspec_tpu.ops.fbank import kaldi_preproc_matrix
    from melspec_tpu.ops.mel_kernel import (LANES, _sig_frontend_matrices,
                                            _sig_stack_combined,
                                            sig_packed_im_bins)

    cfg = FbankConfig()
    fb = Fbank(cfg, fft_impl="sig")
    L, fft, bins = fb.frame_len, fb.fft_size, fb.fft_bins
    B = kaldi_preproc_matrix(L, float(cfg.preemphasis))
    w = fb._window_np[:, None]
    cos_m, msin_m = _dft.rdft_matrices(fft, bins)
    k_pad = -(-L // LANES) * LANES
    cw_f = B.T @ (w * cos_m[:L])
    sw_f = B.T @ (w * msin_m[:L])

    for npack in (True, False):
        if npack:
            im = sig_packed_im_bins(fft, bins)
            n_cols_pad = -(-(bins + len(im)) // LANES) * LANES
            csw = np.zeros((k_pad, n_cols_pad))
            csw[:L, :bins] = cw_f
            csw[:L, bins : bins + len(im)] = sw_f[:, im]
        else:
            nbp = -(-bins // LANES) * LANES
            csw = np.zeros((k_pad, 2 * nbp))
            csw[:L, :bins] = cw_f
            csw[:L, nbp : nbp + bins] = sw_f
        want, want_pair = _sig_stack_combined(csw, ks=3, km=3, cutoff=2,
                                              pack=L)
        got, pair, _, _, _, _, gp = _sig_frontend_matrices(
            fft, bins, fb._window_np, fb._filters_np, ks=3, km=3,
            cutoff=2, pack=L, preproc=B, npack=npack)
        assert gp is npack and pair == want_pair
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))
