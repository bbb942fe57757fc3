"""Compiled-mode (Mosaic) golden gates on the real TPU chip.

The main suite runs pallas kernels on CPU with ``interpret=True``
(tests/conftest.py), which cannot catch compiled-only hazards — e.g. the
``astype``-vs-``reduce_precision`` folding question the bf3 kernel
documents (ops/mel_kernel.py) is a property of Mosaic's compilation, not
of the math. This subset re-runs the master end-to-end golden gates with
the kernels COMPILED on the chip; ``bench.py`` executes it during every
bench session, so published numbers always ride gate-enforced numerics
(VERDICT r2 item 6: observations -> enforced gates).

Run manually:  MELSPEC_TPU_TESTS=1 python -m pytest -m tpu tests/ -q
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        os.environ.get("MELSPEC_TPU_TESTS") != "1",
        reason="compiled-mode gates need MELSPEC_TPU_TESTS=1 (real chip)",
    ),
]


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")


@pytest.fixture(scope="module")
def jfk_golden(testdata):
    return np.load(testdata / "rust_jfk_golden.npy")


def _jfk(jfk_samples, **kw):
    from melspec_tpu.ops.mel_kernel import whisper_mel_pallas

    # fft=512: the master golden's config (rust_jfk_golden.npy)
    got = whisper_mel_pallas(jfk_samples, 512, 160, 80, 16000.0,
                             streaming=True, **kw)
    return np.asarray(got).T  # golden is feature-major


def test_sig_kernel_jfk_golden_compiled(jfk_samples, jfk_golden):
    """The shipped default path, Mosaic-compiled, must hold the 1e-5 bar."""
    got = _jfk(jfk_samples)  # default resolves to the sig kernel on MXU
    assert got.shape == jfk_golden.shape
    assert np.abs(got - jfk_golden).max() <= 1e-5


def test_bf3_kernel_jfk_golden_compiled(jfk_samples, jfk_golden):
    got = _jfk(jfk_samples, impl="bf3")
    assert np.abs(got - jfk_golden).max() <= 1e-5


def test_hp8_kernel_jfk_golden_compiled(jfk_samples, jfk_golden):
    got = _jfk(jfk_samples, impl="hp8")
    assert np.abs(got - jfk_golden).max() <= 2e-6


def test_hp_kernel_jfk_golden_compiled(jfk_samples, jfk_golden):
    got = _jfk(jfk_samples, hp=True)
    assert np.abs(got - jfk_golden).max() <= 1e-6


def _host_f64_whisper_mel(x: np.ndarray) -> np.ndarray:
    """Exact float64 host reference for the batch whisper-mel contract
    (frame k at k*hop, per-frame norm) — no device compiles needed."""
    from melspec_tpu.ops.filterbank import mel_filterbank
    from melspec_tpu.ops.windows import hann_periodic

    fft, hop, n_mels = 400, 160, 80
    nf = (len(x) - fft) // hop + 1
    idx = np.arange(nf)[:, None] * hop + np.arange(fft)
    frames = x.astype(np.float64)[idx] * hann_periodic(fft)
    spec = np.fft.rfft(frames, axis=-1)[:, : fft // 2]
    power = spec.real**2 + spec.imag**2
    filters = mel_filterbank(16000.0, fft, n_mels)[:, : fft // 2]
    log_mel = np.log10(np.maximum(power @ filters.T, 1e-10))
    mmax = log_mel.max(axis=-1, keepdims=True) - 8.0
    return (np.maximum(log_mel, mmax) + 4.0) / 4.0


def test_sig_geometry_edges_compiled():
    """Zero-copy tail DMA edge cases, compiled: clip lengths around the
    macro-row/tile boundaries (whole macro-rows / padded path / ragged
    tail rows) vs the exact f64 host reference."""
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    rng = np.random.default_rng(3)
    # two lengths: the padded/ragged-tail path and a short clip (each
    # extra length is a fresh ~60 s remote compile inside the bench
    # session, so the whole-macro-row case rides the JFK gates instead)
    for n in (640 * 129 + 7, 16000):
        x = (rng.normal(size=n) * 0.3).astype(np.float32)
        got = np.asarray(whisper_mel_sig(x, 400, 160, 80, 16000.0))
        ref = _host_f64_whisper_mel(x)
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() <= 1e-5, f"n={n}"


def test_flat_input_parity_compiled():
    """FLAT input mode (batch-on-sublanes framing, no host macro-row
    relayout) vs rows mode, compiled, at a NON-128-aligned frame offset
    (streaming fft=400 -> offset 80, so the m0 lane-shift rides every
    phase-class roll). Rows mode is golden-gated above; flat must agree
    bit-for-bit because both modes feed the identical DFT/mel pipeline —
    only the framing assembly differs (measured 0.0 on chip)."""
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    x = jax.random.normal(jax.random.PRNGKey(2), (8, 5 * 16000),
                          dtype=jnp.float32) * 0.1
    rows = np.asarray(whisper_mel_sig(x, streaming=True, input_mode="rows"))
    flat = np.asarray(whisper_mel_sig(x, streaming=True, input_mode="flat"))
    assert rows.shape == flat.shape == (8, 498, 80)
    np.testing.assert_array_equal(rows, flat)


def test_multihead_pair_parity_compiled(jfk_samples):
    """The whisper+kaldi fused pair kernel, compiled, vs the single-head
    kernels: the per-head dots over the shared bf16 slice cascade
    (round 4's restructure of the one wide m_cat matmul) perform the
    identical products in the identical MXU accumulation order, so the
    mel head must agree BIT-FOR-BIT with whisper_mel_sig and the fbank
    head with Fbank's sig route (measured 0.0 on chip both)."""
    from melspec_tpu.config import FbankConfig
    from melspec_tpu.ops.fbank import Fbank
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig
    from melspec_tpu.ops.sig_multihead import WhisperKaldiFused

    x = np.asarray(jfk_samples)[: 16000 * 6][None]
    fused = WhisperKaldiFused()
    mel, fbank = fused.compute(jnp.asarray(x))
    want_mel = np.asarray(whisper_mel_sig(x, 400, 160, 80, 16000.0))
    want_fb = np.asarray(
        Fbank(FbankConfig(apply_cmn=True), fft_impl="sig").compute(x))
    np.testing.assert_array_equal(np.asarray(mel), want_mel)
    np.testing.assert_array_equal(np.asarray(fbank), want_fb)


def test_vad_fields_parity_compiled(jfk_samples):
    """Batched on-device VAD decision fields, compiled, vs the host
    reference path (which the naive-differential suite pins to src/vad.rs
    semantics). Exact decision agreement is required — the fields are
    integer counts off booleans, and mel parity (<=1e-5) sits far below
    the Sobel energy threshold."""
    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.ops.mel_kernel import whisper_mel_vad_sig
    from melspec_tpu.ops.vad import (
        streaming_decision_fields,
        streaming_decision_fields_batched,
    )

    settings = DetectionSettings()
    mel, raw = whisper_mel_vad_sig(jfk_samples[None], settings,
                                   streaming=True)
    got = jax.jit(
        lambda r: streaming_decision_fields_batched(None, settings, raw=r)
    )(raw)
    img = np.swapaxes(np.asarray(mel), -1, -2)
    want = streaming_decision_fields(img[0], settings)
    assert want is not None
    np.testing.assert_array_equal(np.asarray(got["active"][0]),
                                  want["active"])
    np.testing.assert_array_equal(np.asarray(got["active_columns"][0]),
                                  want["active_columns"])
    np.testing.assert_array_equal(np.asarray(got["leading"][0]),
                                  want["leading"])


def test_npack_fbank_golden_compiled(jfk_samples, testdata):
    """The N-packed column layout (re + nonzero-im columns in one 512-lane
    stack, re/im add folded into the projection — the Kaldi/NeMo sig
    default), Mosaic-compiled, must hold the kaldi_native_fbank golden
    gate the CPU suite enforces in interpret mode."""
    from melspec_tpu.ops.fbank import Fbank, FbankConfig

    with np.load(testdata / "kaldi_native_fbank_jfk.npz") as npz:
        golden = npz["features"].T  # [frames, 80]
    feats = np.asarray(
        Fbank(FbankConfig(), fft_impl="sig").compute(jfk_samples)
    )
    assert feats.shape == golden.shape
    assert np.abs(feats - golden).max() < 0.016


def test_resample_parity_compiled(jfk_samples):
    """The polyphase resampler's strided-conv path (precision=HIGHEST),
    XLA-compiled on chip, vs the f64 host polyphase reference (which the
    CPU suite pins to scipy.signal.resample_poly at 1e-12). Covers the
    serving ingest ratios: 48 k->16 k and 44.1 k->16 k."""
    from melspec_tpu.ops.resample import StreamingResampler, resample_poly

    x = np.asarray(jfk_samples[: 16000 * 3], np.float32)
    for up, down in ((1, 3), (160, 441)):
        host = StreamingResampler(up, down, dtype=np.float64)
        ref = np.concatenate([host.push(x.astype(np.float64)),
                              host.flush()])
        got = np.asarray(jax.jit(
            lambda a, u=up, d=down: resample_poly(a, u, d)
        )(x))
        assert got.shape == ref.shape
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() <= 1e-5 * scale, (up, down)


def test_quantized_emission_parity_compiled(jfk_samples):
    """The fused u8 wire-record emission (whisper_mel_quantized),
    Mosaic-compiled, vs quantizing the compiled sig kernel's mel with
    quantize_frames_jnp. The two PROGRAMS share the same kernel math but
    compile separately, so the mel values may differ by an ulp at a
    rounding boundary — decisions are allowed +-1 quantization step
    (measured 0 on chip); ranges must match to f32 roundoff."""
    from melspec_tpu.ops.mel_kernel import (whisper_mel_quantized,
                                            whisper_mel_sig)
    from melspec_tpu.ops.quant import quantize_frames_jnp

    x = np.asarray(jfk_samples, np.float32)[None]
    q, lo, hi = jax.device_get(whisper_mel_quantized(x))
    mel = whisper_mel_sig(x)
    q_ref, lo_ref, hi_ref = jax.device_get(quantize_frames_jnp(mel))
    assert q.dtype == np.uint8 and q.shape == q_ref.shape
    steps = np.abs(q.astype(np.int32) - q_ref.astype(np.int32))
    assert steps.max() <= 1
    np.testing.assert_allclose(lo, lo_ref, atol=1e-6)
    np.testing.assert_allclose(hi, hi_ref, atol=1e-6)


def test_mfcc_external_anchor_compiled(jfk_samples, testdata):
    """MFCC over the fused sig fbank kernel, Mosaic-compiled, must hold
    the external kaldi_native_fbank anchor the CPU suite enforces
    (tests/test_mfcc.py::test_mfcc_external_anchor_via_kaldi_native_golden
    — the lifted DCT-II applied to the vendored golden in f64, CMN
    commuting with the linear cepstral map)."""
    from melspec_tpu.config import FbankConfig, MfccConfig
    from melspec_tpu.ops.mfcc import (Mfcc, cepstral_lifter_coeffs,
                                      dct_matrix)

    with np.load(testdata / "kaldi_native_fbank_jfk.npz") as npz:
        gfb = npz["features"].T.astype(np.float64)
    cfg = MfccConfig(fbank=FbankConfig(apply_cmn=False))
    got = np.asarray(Mfcc(cfg, fft_impl="sig").compute(jfk_samples))
    m = dct_matrix(13, 80) * cepstral_lifter_coeffs(13, 22.0)[:, None]
    want = gfb @ m.T
    d = np.abs(got - want)
    assert d.max() < 0.2 and d.mean() < 0.03
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99999


def test_resample_pallas_kernel_parity_compiled(jfk_samples):
    """The Pallas slab-DMA resampler (MultiStreamResampler
    impl='kernel'), Mosaic-compiled, vs the f64 host polyphase reference
    after the spurious warm-up prefix — the serving tick's 48 k and 8 k
    ingest ratios."""
    from melspec_tpu.ops.resample import StreamingResampler
    from melspec_tpu.streaming.resample import MultiStreamResampler

    for precision in ("highest", "bf3"):
        for up, down in ((1, 3), (2, 1)):
            n = down * 128 * 25  # q = 3200 windows
            x = np.tile(np.asarray(jfk_samples[:n], np.float32), (8, 1))
            mr = MultiStreamResampler(up, down, 8, align=160,
                                      impl="kernel", precision=precision)
            _, y = mr.push(mr.init(), x)
            got = y[0, mr.spurious_out:]
            host = StreamingResampler(up, down, dtype=np.float64)
            ref = host.push(x[0].astype(np.float64))
            m = min(len(got), len(ref))
            assert m > 1000
            scale = np.abs(ref).max()
            assert np.abs(got[:m] - ref[:m]).max() <= 1e-5 * scale, (
                precision, up, down)
