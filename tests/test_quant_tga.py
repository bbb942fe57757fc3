"""Quantization + TGA container: round trips, byte layout vs the checked-in
golden, interleaving semantics (reference ``src/quant.rs``,
``src/mel.rs:480-544``, README TGA contract ``tests/readme_examples.rs:57-69``)."""

import struct

import numpy as np
import pytest

from melspec_tpu.io.tga import (
    chunk_frames_into_strides,
    interleave_frames,
    load_tga_8bit,
    parse_tga_8bit,
    save_tga_8bit,
    tga_8bit,
    tga_8bit_data,
    to_array2,
)
from melspec_tpu.ops.quant import (
    QuantizationRange,
    dequantize,
    dequantize_jnp,
    quantize,
    quantize_jnp,
)


def test_quantize_dequantize_roundtrip():
    rng = np.random.default_rng(0)
    data = rng.normal(size=800).astype(np.float32)
    q, qr = quantize(data)
    assert q.dtype == np.uint8
    assert qr.min == data.min() and qr.max == data.max()
    back = dequantize(q, qr)
    step = (qr.max - qr.min) / 255.0
    assert np.abs(back - data).max() <= step / 2 + 1e-6


def test_quantize_constant_input_yields_zero():
    data = np.full(80, 3.25, dtype=np.float32)
    q, qr = quantize(data)
    assert (q == 0).all()  # Rust NaN.max(0).min(255) chain -> 0
    assert qr.min == qr.max == 3.25


def test_quantize_jnp_matches_host():
    rng = np.random.default_rng(1)
    data = rng.normal(size=640).astype(np.float32)
    q_host, qr = quantize(data)
    q_dev, lo, hi = quantize_jnp(data)
    assert np.array_equal(np.asarray(q_dev), q_host)
    assert float(lo) == qr.min and float(hi) == qr.max
    np.testing.assert_allclose(
        np.asarray(dequantize_jnp(q_dev, lo, hi)), dequantize(q_host, qr), atol=1e-6
    )


def test_tga_save_load_roundtrip(tmp_path):
    n_mels = 80
    frame = np.arange(n_mels, dtype=np.float64).reshape(n_mels, 1) / n_mels
    interleaved = interleave_frames([frame], False, 2)
    path = tmp_path / "roundtrip.tga"
    save_tga_8bit(interleaved, n_mels, path)
    loaded = load_tga_8bit(path)
    assert loaded.shape == interleaved.shape
    q, qr = quantize(interleaved)
    np.testing.assert_array_equal(loaded, dequantize(q, qr))


def test_tga_header_layout():
    data = np.linspace(-1.0, 1.0, 80 * 6).astype(np.float32)
    blob = tga_8bit_data(data, 80)
    assert blob[0] == 8          # ID length
    assert blob[1] == 0          # no color map
    assert blob[2] == 3          # uncompressed grayscale
    width, height = struct.unpack_from("<HH", blob, 12)
    assert (width, height) == (6, 80)
    assert blob[16] == 8         # bits per pixel
    lo, hi = struct.unpack_from("<ff", blob, 18)
    assert lo == data.min() and hi == data.max()
    assert len(blob) == 18 + 8 + 80 * 6


def test_parse_golden_tga(testdata):
    """The checked-in golden must parse to an 80-mel image with sane range
    (whisper-normalized mel lives in roughly [-1.5, 2.5])."""
    mel = load_tga_8bit(testdata / "quantized_mel_golden.tga")
    img = to_array2(mel, 80)
    assert img.shape[0] == 80
    assert img.shape[1] > 100
    assert -2.0 < img.min() < img.max() < 3.0
    # byte-level re-serialization: quantizing the dequantized image with its
    # own range must reproduce the golden's pixel bytes
    blob = (testdata / "quantized_mel_golden.tga").read_bytes()
    pixels = np.frombuffer(blob, dtype=np.uint8, offset=26)
    requant, qr = quantize(mel.astype(np.float32))
    assert qr.min == struct.unpack_from("<f", blob, 18)[0]
    assert np.array_equal(requant, pixels)


def test_interleave_row_major_is_whisper_layout():
    f1 = np.arange(6, dtype=np.float64).reshape(3, 2)
    f2 = (np.arange(3, dtype=np.float64) + 10).reshape(3, 1)
    out = interleave_frames([f1, f2], False, 0)
    np.testing.assert_array_equal(out, [0, 1, 10, 2, 3, 11, 4, 5, 12])


def test_interleave_column_major():
    f1 = np.arange(6, dtype=np.float64).reshape(3, 2)
    f2 = (np.arange(3, dtype=np.float64) + 10).reshape(3, 1)
    out = interleave_frames([f1, f2], True, 0)
    np.testing.assert_array_equal(out, [0, 1, 2, 3, 4, 5, 10, 11, 12])


def test_interleave_pads_odd_frames_to_even():
    frame = np.ones((4, 1))
    out = interleave_frames([frame], False, 2)
    assert out.size == 8  # zero frame appended -> 2 columns
    assert out.reshape(4, 2)[:, 1].sum() == 0


def test_interleave_min_width_padding():
    frame = np.ones((4, 2))
    out = interleave_frames([frame], False, 6)
    img = out.reshape(4, 6)
    assert img[:, :2].sum() == 8 and img[:, 2:].sum() == 0


def test_interleave_rejects_bad_args():
    with pytest.raises(ValueError):
        interleave_frames([], False, 0)
    with pytest.raises(ValueError):
        interleave_frames([np.ones((4, 1))], False, 3)  # odd min_width


def test_chunk_frames_into_strides():
    data = np.arange(4 * 10, dtype=np.float32)
    chunks = chunk_frames_into_strides(data, 4, 10)
    assert len(chunks) == 1 and np.array_equal(chunks[0], data)
    chunks = chunk_frames_into_strides(data, 4, 4)
    assert len(chunks) == 3
    img = data.reshape(4, 10)
    np.testing.assert_array_equal(chunks[0], img[:, 0:4].reshape(-1))
    np.testing.assert_array_equal(chunks[2], img[:, 8:10].reshape(-1))


def test_tga_8bit_multi_chunk():
    n_mels = 4
    data = np.random.default_rng(2).normal(size=n_mels * 100).astype(np.float32)
    blobs = tga_8bit(data, n_mels)
    total = sum(
        np.frombuffer(b, dtype=np.uint8, offset=26).size for b in blobs
    )
    assert total == data.size
    for blob in blobs:
        parse_tga_8bit(blob)  # must parse cleanly


def test_quantize_rounds_half_away_from_zero_like_rust():
    """The reference quantizes with f32 .round() (half away from zero).
    floor(x + 0.5) differs one ulp below a half: the f32 ADD rounds
    0.49999997 + 0.5 up to 1.0 first. Byte parity demands the exact rule."""
    frame = np.array([0.0, 255.0, 0.49999997], dtype=np.float32)
    q, rng = quantize(frame)
    assert q.tolist() == [0, 255, 0]  # scaled 0.49999997 rounds DOWN
    frame2 = np.array([0.0, 255.0, 0.5], dtype=np.float32)
    q2, _ = quantize(frame2)
    assert q2.tolist() == [0, 255, 1]  # an exact half rounds AWAY

    import jax.numpy as jnp

    qj, lo, hi = quantize_jnp(jnp.asarray(frame))
    assert np.asarray(qj).tolist() == [0, 255, 0]


def test_tga_8bit_data_rejects_ragged_columns():
    from melspec_tpu.io.tga import tga_8bit_data

    with pytest.raises(ValueError):
        tga_8bit_data(np.zeros(81, np.float32), 80)
