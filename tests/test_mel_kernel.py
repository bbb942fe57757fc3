"""Fused Pallas kernel parity vs the jnp pipeline (interpret mode on CPU;
the same kernel runs compiled on TPU). The parity bar here is tighter than
the reference's GPU gates (max<0.08/mean<0.01, ``src/cuda.rs:540-545``)
because both paths share f32 DFT semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from melspec_tpu.ops.mel_kernel import TILE_FRAMES, _build_matrices, whisper_mel_pallas
from melspec_tpu.ops.spectrogram import WhisperMelPipeline


@pytest.fixture(scope="module")
def signal():
    rng = np.random.default_rng(0)
    return (rng.normal(size=60000) * 0.2).astype(np.float32)


def test_matrix_padding():
    cw, sw, mt, n_bins_pad, n_mels_pad, k_pad = _build_matrices(400, 80, 16000.0)
    assert cw.shape == (512, 256) and mt.shape == (256, 128)
    assert (cw[:, 200:] == 0).all() and (cw[400:] == 0).all()
    assert (mt[200:] == 0).all() and (mt[:, 80:] == 0).all()
    assert TILE_FRAMES % 8 == 0


@pytest.mark.parametrize("fft,hop", [(400, 160), (512, 160)])
def test_kernel_matches_jnp_batch(signal, fft, hop):
    got = np.asarray(
        whisper_mel_pallas(signal, fft, hop, 80, 16000.0, interpret=True)
    )
    pipe = WhisperMelPipeline(fft, hop, 80, 16000.0, dtype=jnp.float32)
    want = np.asarray(pipe.mel_batch(signal))
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-4


def test_kernel_streaming_equivalent(signal):
    got = np.asarray(
        whisper_mel_pallas(signal, 512, 160, 80, 16000.0, streaming=True,
                           interpret=True)
    )
    pipe = WhisperMelPipeline(512, 160, 80, 16000.0, dtype=jnp.float32)
    want = np.asarray(pipe.mel_streaming_equivalent(signal)).T
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-4


def test_kernel_batched_input(signal):
    batch = np.stack([signal[:40000], signal[20000:60000]])
    got = np.asarray(
        whisper_mel_pallas(batch, 400, 160, 80, 16000.0, interpret=True)
    )
    for i in range(2):
        single = np.asarray(
            whisper_mel_pallas(batch[i], 400, 160, 80, 16000.0, interpret=True)
        )
        np.testing.assert_allclose(got[i], single, atol=1e-6)


def test_kernel_jfk_golden_gate(testdata, jfk_samples):
    """The SHIPPED (default) kernel must hold the driver's 1e-5 bar on the
    master end-to-end golden — far past the reference's own accelerator
    gate (max<0.08, mean<0.01, ``src/cuda.rs:540-545``). Measured: 4.5e-6
    (bf3 default)."""
    golden = np.load(testdata / "rust_jfk_golden.npy")
    got = np.asarray(
        whisper_mel_pallas(jfk_samples, 512, 160, 80, 16000.0,
                           streaming=True, interpret=True)
    ).T
    assert got.shape == golden.shape
    assert np.abs(got - golden).max() <= 1e-5


def test_hp8_kernel_jfk_golden(testdata, jfk_samples):
    """int8-Ozaki kernel on the master golden (measured 9.5e-7)."""
    golden = np.load(testdata / "rust_jfk_golden.npy")
    got = np.asarray(
        whisper_mel_pallas(jfk_samples, 512, 160, 80, 16000.0,
                           streaming=True, interpret=True, impl="hp8")
    ).T
    assert got.shape == golden.shape
    assert np.abs(got - golden).max() <= 2e-6


def test_hp_kernel_jfk_golden(testdata, jfk_samples):
    """The fused Ozaki-split kernel must beat the reference's 1e-6 golden
    gate in pure f32/bf16 arithmetic (measured 2.4e-7)."""
    golden = np.load(testdata / "rust_jfk_golden.npy")
    got = np.asarray(
        whisper_mel_pallas(jfk_samples, 512, 160, 80, 16000.0,
                           streaming=True, interpret=True, hp=True)
    ).T
    assert got.shape == golden.shape
    assert np.abs(got - golden).max() <= 1e-6


def test_kernel_short_input():
    out = whisper_mel_pallas(np.zeros(100, np.float32), 400, 160, 80,
                             16000.0, interpret=True)
    assert out.shape == (0, 80)


@pytest.mark.parametrize("n_samples", [
    640 * 250,        # zero-copy, ragged tail (250 % 8 == 2)
    640 * 264,        # zero-copy, aligned tail (264 % 8 == 0)
    640 * 280,        # zero-copy, tail larger than one tile window
    640 * 137,        # zero-copy, single tile (n_t == 1)
    640 * 8,          # zero-copy, tiny single tile (tail == exactly 8)
    640 * 250 + 321,  # not a macro-row multiple: padded fallback
    640 * 129 + 160,  # fallback with tail < 8 rows after the last tile
])
def test_sig_kernel_input_geometry_edges(n_samples):
    """The zero-copy input path (clamped tail DMA + ragged side input) must
    agree with the padded fallback across every tail-geometry class."""
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    rng = np.random.default_rng(n_samples)
    x = (rng.normal(size=n_samples) * 0.2).astype(np.float32)
    got = np.asarray(
        whisper_mel_sig(x, 400, 160, 80, 16000.0, interpret=True))
    pipe = WhisperMelPipeline(400, 160, 80, 16000.0, dtype=jnp.float32,
                              fft_impl="bf3")
    want = np.asarray(pipe.mel_batch(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sig_kernel_last_frame_uses_ragged_tail_rows():
    """Real audio content in the <8-row ragged remainder must reach the
    final frames (a silent zero-fill there would pass shape checks but
    corrupt the tail of every standard-length clip)."""
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    rng = np.random.default_rng(7)
    n = 640 * 250  # tail = 122 rows -> rem8 = 120, ragged = 2
    x = (rng.normal(size=n) * 0.2).astype(np.float32)
    x_zeroed = x.copy()
    x_zeroed[640 * 248:] = 0.0  # wipe exactly the ragged rows
    a = np.asarray(whisper_mel_sig(x, 400, 160, 80, 16000.0,
                                   interpret=True))
    b = np.asarray(whisper_mel_sig(x_zeroed, 400, 160, 80, 16000.0,
                                   interpret=True))
    assert np.abs(a[-1] - b[-1]).max() > 1e-3  # the content mattered
    np.testing.assert_allclose(a[: a.shape[0] - 10], b[: a.shape[0] - 10],
                               atol=1e-6)  # earlier frames untouched


def test_sig_kernel_streaming_zero_copy_geometry():
    """Streaming mode (nonzero frame offset) through the zero-copy input
    path must match the XLA streaming-equivalent pipeline."""
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig

    rng = np.random.default_rng(5)
    x = (rng.normal(size=640 * 100) * 0.2).astype(np.float32)  # T % 640 == 0
    got = np.asarray(whisper_mel_sig(x, 512, 160, 80, 16000.0,
                                     streaming=True, interpret=True))
    pipe = WhisperMelPipeline(512, 160, 80, 16000.0, dtype=jnp.float32,
                              fft_impl="bf3")
    want = np.asarray(pipe.mel_streaming_equivalent(jnp.asarray(x))).T
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("fft,hop", [
    (512, 128), (256, 64), (1024, 320), (400, 100), (640, 640),
])
def test_sig_kernel_generalized_geometry_configs(fft, hop):
    """The generalized macro-row geometry must agree with the bf3 XLA
    pipeline at non-whisper (fft, hop) combinations (interpret mode)."""
    from melspec_tpu.ops.mel_kernel import sig_geometry, whisper_mel_sig

    geom = sig_geometry(fft, hop, 0)
    assert geom is not None, (fft, hop)
    row_w, phases, rows_tile = geom
    assert row_w % 128 == 0 and row_w % hop == 0
    assert phases == row_w // hop and rows_tile % 8 == 0

    rng = np.random.default_rng(fft + hop)
    x = (rng.normal(size=5 * row_w * max(1, 4096 // row_w)) * 0.2
         ).astype(np.float32)
    got = np.asarray(whisper_mel_sig(x, fft, hop, 80, 16000.0,
                                     interpret=True))
    pipe = WhisperMelPipeline(fft, hop, 80, 16000.0, dtype=jnp.float32,
                              fft_impl="bf3")
    want = np.asarray(pipe.mel_batch(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_sig_npack_layout_matches_split():
    """The N-packed column layout (re columns + nonzero-im columns only,
    re/im add folded into the projection) must agree with the split re|im
    layout to the bf2 projection's own error class — same products, only
    the rounding/accumulation order differs — and the auto rule must pick
    packed exactly when it narrows the stack."""
    from melspec_tpu.ops.filterbank import mel_filterbank
    from melspec_tpu.ops.mel_kernel import (_pallas_sig_mel,
                                            _sig_frontend_matrices,
                                            bf2_stack, sig_geometry,
                                            sig_packed_im_bins)
    from melspec_tpu.ops.windows import hann_periodic

    fft, hop, n_mels = 512, 160, 80
    # DC and Nyquist have identically-zero sin columns; nothing else does
    assert sig_packed_im_bins(512, 257) == [j for j in range(1, 256)]
    assert sig_packed_im_bins(400, 200) == [j for j in range(1, 200)]

    from melspec_tpu.ops import framing

    filters = mel_filterbank(16000.0, fft, n_mels)
    window = hann_periodic(fft)
    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 48000)) * 0.3).astype(np.float32)
    row_w, phases, rows_tile = sig_geometry(fft, hop, 0)
    n_frames = framing.num_frames_batch(x.shape[-1], fft, hop)

    outs = {}
    for npack in (False, True):
        m_big, pair_i, mt, nbp, _, _, got = _sig_frontend_matrices(
            fft, fft // 2 + 1, window, filters, ks=3, km=3, cutoff=2,
            npack=npack)
        assert got is npack
        # packed: 257 re + 255 im = 512 columns exactly (vs split's 768)
        assert m_big.shape[1] == (512 if npack else 768)
        outs[npack] = np.asarray(_pallas_sig_mel(
            jnp.asarray(x), m_big, bf2_stack(mt), interpret=True, ks=3,
            pair_i=pair_i, n_frames=n_frames, mel_precision="bf2",
            n_mels_out=n_mels, out_mode="ln_guard", guard=2.0**-24,
            row_w=row_w, phases=phases, rows_tile=rows_tile, pack=fft,
            npack=npack))
    # ln-unit absolute error of a 2-slice bf16 energy split is ~2^-16
    np.testing.assert_allclose(outs[True], outs[False], atol=6e-5)

    # auto: 512-point head (257 bins) packs (512 < 768); whisper's
    # 400-point head (200 bins) does not (both layouts pad to 512 and
    # split's projection K is half)
    *_, auto_512 = _sig_frontend_matrices(512, 257, window, filters,
                                          ks=3, km=3, cutoff=2)
    assert auto_512 is True
    from melspec_tpu.ops.windows import hann_periodic as _hp
    filters400 = mel_filterbank(16000.0, 400, n_mels)
    *_, auto_400 = _sig_frontend_matrices(400, 200, _hp(400), filters400,
                                          ks=3, km=3, cutoff=2)
    assert auto_400 is False


def test_cached_device_matrices_built_inside_trace():
    """The lru-cached device-matrix builders must produce CONCRETE arrays
    even when first invoked inside an outer jit trace (regression: the
    cached value used to be a tracer of that first trace, leaking into
    every later trace as UnexpectedTracerError — hit by vad_ten_eval's
    jitted pipeline on a cold process)."""
    import jax

    from melspec_tpu.ops.mel_kernel import (_sig_device_matrices,
                                            whisper_mel_sig)

    _sig_device_matrices.cache_clear()  # force the cold-start path

    def f(x):
        return whisper_mel_sig(x, 400, 160, 80, 16000.0, interpret=True)

    x = jnp.zeros((1, 16000), jnp.float32)
    a = jax.jit(f)(x)          # first trace builds + caches the matrices
    b = jax.jit(lambda y: f(y) + 0.0)(x)  # second, distinct trace reuses
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sig_builder_rejects_short_window_with_pack_off():
    """A window shorter than fft_size writes matrix rows [0, taps) while
    pack_off slices rows [pack_off, pack_off+pack) — combining them
    would silently drop real rows, so the builder must refuse (offset
    interiors need the full-length window with explicit zero flanks)."""
    from melspec_tpu.ops.filterbank import mel_filterbank
    from melspec_tpu.ops.mel_kernel import _sig_frontend_matrices
    from melspec_tpu.ops.windows import hann_periodic

    filters = mel_filterbank(16000.0, 512, 80)
    with pytest.raises(ValueError, match="full fft_size-length window"):
        _sig_frontend_matrices(512, 257, hann_periodic(400), filters,
                               ks=3, km=3, cutoff=2, pack=400,
                               pack_off=56)
    # full-length window with the same offset interior is fine
    w = np.zeros(512)
    w[56:456] = hann_periodic(400)
    _sig_frontend_matrices(512, 257, w, filters, ks=3, km=3, cutoff=2,
                           pack=400, pack_off=56)


def test_quantized_kernel_matches_xla_quant():
    """The fused per-frame u8 epilogue (whisper_mel_quantized) must be
    bit-exact with quantizing the sig kernel's mel output via
    quantize_frames_jnp — same expression tree, same Rust-round()
    tie-breaking (src/wasm.rs:95-145 wire-record semantics)."""
    from melspec_tpu.ops.mel_kernel import (whisper_mel_quantized,
                                            whisper_mel_sig)
    from melspec_tpu.ops.quant import quantize_frames_jnp

    rng = np.random.default_rng(11)
    # b=2 auto-pads to b=8 and rides FLAT input (round-5 eligibility
    # pad); b=8 with T % 128 == 0 is natively flat — both must match
    # the XLA quantizer bit-for-bit
    for b in (2, 8):
        x = (rng.normal(size=(b, 16000)) * 0.1).astype(np.float32)
        q, lo, hi = whisper_mel_quantized(x, interpret=True)
        assert q.dtype == jnp.uint8 and q.shape == (b, 98, 80)
        mel = whisper_mel_sig(x, interpret=True)
        q_ref, lo_ref, hi_ref = quantize_frames_jnp(mel)
        np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
        np.testing.assert_array_equal(np.asarray(lo), np.asarray(lo_ref))
        np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi_ref))


def test_quantized_kernel_degenerate_range():
    """Constant frames (zero signal) have hi == lo; the NaN chain must
    quantize them to 0 exactly like the host quantizer's
    NaN.max(0).min(255) (src/quant.rs:140-165)."""
    from melspec_tpu.ops.mel_kernel import whisper_mel_quantized

    q, lo, hi = whisper_mel_quantized(np.zeros((1, 8000), np.float32),
                                      interpret=True)
    assert (np.asarray(q) == 0).all()
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(hi))


def test_quantized_kernel_geometry_and_squeeze():
    """1-D squeeze contract, ragged-tail clip lengths, the empty-clip
    no-op, and the unsupported-geometry error."""
    from melspec_tpu.ops.mel_kernel import (whisper_mel_quantized,
                                            whisper_mel_sig)
    from melspec_tpu.ops.quant import quantize_frames_jnp

    rng = np.random.default_rng(13)
    # ragged, non-macro-row length exercises the padded fallback and the
    # last tile's clipped stores on BOTH quant outputs
    x = (rng.normal(size=640 * 129 + 7) * 0.2).astype(np.float32)
    q, lo, hi = whisper_mel_quantized(x, interpret=True)
    mel = whisper_mel_sig(x, interpret=True)
    q_ref, lo_ref, hi_ref = quantize_frames_jnp(mel)
    assert q.shape == np.asarray(q_ref).shape and lo.ndim == 1
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi_ref))

    q0, lo0, hi0 = whisper_mel_quantized(np.zeros(100, np.float32),
                                         interpret=True)
    assert q0.shape == (0, 80) and lo0.shape == (0,)

    with pytest.raises(ValueError, match="geometry"):
        whisper_mel_quantized(x, 400, 7, 80, 16000.0, interpret=True)


def test_vad_sig_short_clip_returns_real_mel():
    """Clips with 1-2 frames have no 3x3 Sobel column, but the mel half
    of the contract still holds: whisper_mel_vad_sig must return the real
    log-mel (== whisper_mel_sig), not zeros (regression: short utterances
    used to get silently zeroed features)."""
    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.ops.mel_kernel import whisper_mel_sig, whisper_mel_vad_sig

    rng = np.random.default_rng(3)
    settings = DetectionSettings()
    for n in (400, 600):  # 1 and 2 frames
        x = (rng.normal(size=n) * 0.2).astype(np.float32)
        mel, raw = whisper_mel_vad_sig(x, settings, interpret=True)
        want = np.asarray(whisper_mel_sig(x, interpret=True))
        assert raw.shape == (0,)
        np.testing.assert_array_equal(np.asarray(mel), want)
        assert np.abs(want).max() > 0.0
    # and the empty case stays empty
    mel, raw = whisper_mel_vad_sig(np.zeros(100, np.float32), settings,
                                   interpret=True)
    assert mel.shape == (0, 80) and raw.shape == (0,)


def test_hp_bf16_pair_budget_clamps_slices():
    """Slices whose every pair exceeds hp_max_pair_sum contribute nothing;
    the hp_bf16 route must clamp them away (bf3/hp8 already do) instead of
    running full-width matmuls whose outputs are all discarded. The
    clamped call must equal the explicitly-sized one exactly."""
    rng = np.random.default_rng(4)
    x = (rng.normal(size=8000) * 0.2).astype(np.float32)
    a = np.asarray(whisper_mel_pallas(x, 400, 160, 80, 16000.0, hp=True,
                                      hp_n_slices=5, hp_max_pair_sum=2,
                                      interpret=True))
    b = np.asarray(whisper_mel_pallas(x, 400, 160, 80, 16000.0, hp=True,
                                      hp_n_slices=3, hp_max_pair_sum=2,
                                      interpret=True))
    np.testing.assert_array_equal(a, b)


def test_flat_vs_rows_input_modes_bit_equal():
    """FLAT input framing (windows DMA'd from the untouched [B, T]
    operand) vs ROWS mode (host macro-row relayout), interpret-mode
    differential: both feed the identical DFT/mel pipeline, so outputs
    must agree BIT-FOR-BIT — at an aligned offset (batch), a
    non-128-aligned one (streaming, offset 80), and a length whose
    trailing tile needs the clamped zero-filled DMA. The compiled twin
    (tests/test_tpu_compiled.py::test_flat_input_parity_compiled) pins
    the Mosaic lowering; this pins the logic in CI."""
    from melspec_tpu.ops.mel_kernel import (_sig_flat_geometry,
                                             whisper_mel_sig)

    rng = np.random.default_rng(7)
    for streaming, t in ((False, 16000), (True, 16000), (False, 19968)):
        # flat requires B % 8 == 0 and T % 128 == 0 — assert the case is
        # actually exercising the flat path, not silently rows-vs-rows
        offset = 80 if streaming else 0
        assert _sig_flat_geometry(160, 512, offset, 8, t) is not None
        x = (rng.normal(size=(8, t)) * 0.2).astype(np.float32)
        rows = np.asarray(whisper_mel_sig(x, streaming=streaming,
                                          input_mode="rows",
                                          interpret=True))
        flat = np.asarray(whisper_mel_sig(x, streaming=streaming,
                                          input_mode="flat",
                                          interpret=True))
        np.testing.assert_array_equal(rows, flat)


def test_autopad_into_flat_eligibility():
    """Round-5 eligibility pad: a ``B % 8 != 0`` / ``T % 128 != 0``
    caller must ride the FLAT input path via zero-padding instead of
    silently falling back to rows mode (round 4's cliff:
    ``_sig_flat_geometry`` returning ``None``). Padded clips are zeros
    and get sliced off; padded tail samples read as the same zeros the
    clamped tail DMA would have synthesized — so the auto (padded-flat)
    output must equal the explicit rows-mode output BIT-FOR-BIT, and the
    quantized / fused-VAD epilogue variants must keep their established
    differentials at the ragged batch shape."""
    from melspec_tpu.ops.mel_kernel import (_pad_for_flat,
                                            _sig_flat_geometry,
                                            whisper_mel_quantized,
                                            whisper_mel_sig,
                                            whisper_mel_vad_sig)
    from melspec_tpu.ops.quant import quantize_frames_jnp
    from melspec_tpu.ops.vad import DetectionSettings, classify_columns

    rng = np.random.default_rng(23)
    x = (rng.normal(size=(5, 15900)) * 0.2).astype(np.float32)

    # the pad helper itself: (5, 15900) -> (8, 16000), flat-eligible,
    # real samples untouched, pad region all zeros
    xp = np.asarray(_pad_for_flat(jnp.asarray(x), 160, 512, 0,
                                  epilogue=False))
    assert xp.shape == (8, 16000)
    assert _sig_flat_geometry(160, 512, 0, 8, 16000) is not None
    np.testing.assert_array_equal(xp[:5, :15900], x)
    assert not xp[5:].any() and not xp[:, 15900:].any()

    rows = np.asarray(whisper_mel_sig(x, input_mode="rows",
                                      interpret=True))
    auto = np.asarray(whisper_mel_sig(x, interpret=True))
    assert auto.shape == rows.shape and auto.shape[0] == 5
    np.testing.assert_array_equal(rows, auto)

    q, lo, hi = whisper_mel_quantized(x, interpret=True)
    q_ref, lo_ref, hi_ref = quantize_frames_jnp(jnp.asarray(rows))
    assert q.shape == (5,) + rows.shape[1:]
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(lo_ref))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(hi_ref))

    settings = DetectionSettings()
    mel, raw = whisper_mel_vad_sig(x, settings, interpret=True)
    assert mel.shape[0] == raw.shape[0] == 5
    np.testing.assert_array_equal(np.asarray(mel), rows)
    want = classify_columns(jnp.swapaxes(jnp.asarray(rows), -1, -2),
                            settings)
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(want))
