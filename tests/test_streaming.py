"""Streaming layer: emission timing, JFK golden through the ring-buffer
pipeline (the reference's master regression, ``src/rb.rs:134-179``), scan
path vs per-hop path, state serialization."""

import numpy as np
import pytest
import jax.numpy as jnp

from melspec_tpu.config import MelConfig
from melspec_tpu.streaming.pipeline import RingBuffer
from melspec_tpu.streaming.stft import StreamingMel


def test_emission_timing():
    """Reference ``src/stft.rs:175-194``: fft=8, hop=4 — a 3-sample chunk
    emits nothing, a full hop after 7 samples emits nothing, the next hop
    emits."""
    mel = StreamingMel(MelConfig(fft_size=8, hop_size=4, n_mels=2,
                                 sampling_rate=16000.0))
    state = mel.init()
    state, out = mel.push(state, np.array([1.0, 2.0, 3.0], dtype=np.float32))
    assert out is None
    state, out = mel.push(state, np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32))
    assert out is None
    state, out = mel.push(state, np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32))
    assert out is not None


def test_jfk_golden_through_ringbuffer(testdata, jfk_samples):
    """Master regression: stream JFK in 32-sample pushes through the ring
    pipeline, compare the full [80, 1097] matrix to the golden."""
    golden = np.load(testdata / "rust_jfk_golden.npy")
    config = MelConfig(fft_size=512, hop_size=160, n_mels=80,
                       sampling_rate=16000.0)
    rb = RingBuffer(config, capacity=2048, dtype=jnp.float64)
    frames = []
    for off in range(0, len(jfk_samples), 32):
        rb.add_frame(jfk_samples[off : off + 32])
        mel = rb.maybe_mel()
        if mel is not None:
            frames.append(mel)
    got = np.concatenate(frames, axis=1)
    assert got.shape == golden.shape
    assert np.abs(got - golden).max() <= 1e-6


def test_drain_mels_bulk_equals_per_hop(testdata, jfk_samples):
    config = MelConfig(fft_size=512, hop_size=160, n_mels=80,
                       sampling_rate=16000.0)
    golden = np.load(testdata / "rust_jfk_golden.npy")
    rb = RingBuffer(config, capacity=1 << 22, dtype=jnp.float64)
    rb.add_frame(jfk_samples)
    frames = rb.drain_mels()
    got = np.concatenate(frames, axis=1)
    assert got.shape == golden.shape
    assert np.abs(got - golden).max() <= 1e-6


def test_scan_matches_batched_path(jfk_samples):
    """push_many (lax.scan) must equal the batched streaming-equivalent
    pipeline exactly."""
    from melspec_tpu.ops.spectrogram import compute_streaming_mel

    config = MelConfig(fft_size=400, hop_size=160, n_mels=80,
                       sampling_rate=16000.0)
    samples = jfk_samples[:32000]
    mel = StreamingMel(config, dtype=jnp.float64)
    state = mel.init()
    n_hops = len(samples) // 160
    chunks = samples[: n_hops * 160].reshape(n_hops, 160)
    state, mels, valid = mel.push_many(state, chunks)
    got = mels[valid].T  # [n_mels, frames]
    want = compute_streaming_mel(samples, 400, 160, 80, 16000.0,
                                 dtype=jnp.float64)
    assert got.shape == want.shape
    # `want` is returned as float32; compare at float32 resolution
    assert np.abs(got.astype(np.float32) - want).max() <= 1e-6


def test_short_chunk_zero_padding():
    """A short final chunk is zero-padded to the hop and still advances the
    sample counter by its true length (reference ``src/stft.rs:52-64``)."""
    config = MelConfig(fft_size=8, hop_size=4, n_mels=2, sampling_rate=16000.0)
    mel = StreamingMel(config)
    state = mel.init()
    state, _ = mel.push(state, np.ones(4, dtype=np.float32))
    state, out = mel.push(state, np.ones(3, dtype=np.float32))
    # idx = 7 < 8: no emission even though two hops were pushed
    assert out is None
    state, out = mel.push(state, np.ones(4, dtype=np.float32))
    assert out is not None


def test_checkpoint_resume(tmp_path, jfk_samples):
    """Streaming can checkpoint mid-clip and resume bit-identically."""
    from melspec_tpu.streaming.stft import load_state, save_state

    config = MelConfig(fft_size=400, hop_size=160, n_mels=80,
                       sampling_rate=16000.0)
    mel = StreamingMel(config, dtype=jnp.float64)

    # continuous run
    state = mel.init()
    outs_full = []
    for off in range(0, 16000, 160):
        state, out = mel.push(state, jfk_samples[off : off + 160])
        outs_full.append(out)

    # checkpointed run: stop halfway, persist, reload, continue
    state = mel.init()
    outs_ckpt = []
    for off in range(0, 8000, 160):
        state, out = mel.push(state, jfk_samples[off : off + 160])
        outs_ckpt.append(out)
    save_state(state, tmp_path / "stream.npz")
    state = load_state(tmp_path / "stream.npz")
    for off in range(8000, 16000, 160):
        state, out = mel.push(state, jfk_samples[off : off + 160])
        outs_ckpt.append(out)

    assert len(outs_full) == len(outs_ckpt)
    for a, b in zip(outs_full, outs_ckpt):
        assert (a is None) == (b is None)
        if a is not None:
            np.testing.assert_array_equal(a, b)


def test_state_is_serializable():
    config = MelConfig(fft_size=400, hop_size=160, n_mels=80,
                       sampling_rate=16000.0)
    mel = StreamingMel(config)
    state = mel.init()
    state, _ = mel.push(state, np.ones(160, dtype=np.float32))
    # round-trip through host numpy (checkpoint/resume analogue)
    buf, idx = np.asarray(state.hop_buf), np.asarray(state.idx)
    import jax

    restored = type(state)(jnp.asarray(buf), jnp.asarray(idx))
    state2, out2 = mel.push(restored, np.ones(160, dtype=np.float32))
    state3, out3 = mel.push(state, np.ones(160, dtype=np.float32))
    assert (out2 is None) == (out3 is None)
    np.testing.assert_array_equal(np.asarray(state2.hop_buf),
                                  np.asarray(state3.hop_buf))


def test_push_many_bulk_matches_scan(jfk_samples):
    """StreamingMel.push_many's batched-framing fast path vs the per-hop
    lax.scan reference path: identical mels, valids, and carried state."""
    config = MelConfig(fft_size=400, hop_size=160, n_mels=80,
                       sampling_rate=16000.0)
    mel = StreamingMel(config, dtype=jnp.float64)
    chunks = jfk_samples[: 50 * 160].reshape(50, 160)
    s_b, m_b, v_b = mel.push_many(mel.init(), chunks)
    s_s, m_s, v_s = mel.push_many(mel.init(), chunks, scan=True)
    np.testing.assert_array_equal(v_b, v_s)
    np.testing.assert_allclose(m_b[v_b], m_s[v_s], atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_b.hop_buf),
                               np.asarray(s_s.hop_buf))
    assert int(s_b.idx) == int(s_s.idx)


def test_push_many_empty_batch_is_noop():
    from melspec_tpu.config import MelConfig
    from melspec_tpu.streaming.stft import StreamingMel

    mel = StreamingMel(MelConfig(400, 160, 80, 16000.0))
    state = mel.init()
    state2, mels, valid = mel.push_many(state, np.zeros((0, 160), np.float32))
    assert mels.shape == (0, 80) and valid.shape == (0,)
    np.testing.assert_array_equal(np.asarray(state2.hop_buf),
                                  np.asarray(state.hop_buf))


def test_ring_buffer_rejects_capacity_below_hop():
    import pytest

    from melspec_tpu.config import MelConfig
    from melspec_tpu.streaming.pipeline import RingBuffer

    with pytest.raises(ValueError):
        RingBuffer(MelConfig(400, 160, 80, 16000.0), capacity=100)
