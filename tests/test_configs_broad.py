"""Broad config coverage: non-16k sample rates, 128-mel (whisper large-v3
style), odd fft/hop combinations — every pipeline must keep its frame
semantics and match the f64 naive computation."""

import numpy as np
import pytest
import jax.numpy as jnp

from melspec_tpu.ops import framing
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.ops.spectrogram import WhisperMelPipeline
from melspec_tpu.ops.windows import hann_periodic


@pytest.mark.parametrize(
    "fft,hop,n_mels,sr",
    [
        (400, 160, 128, 16000.0),   # whisper large-v3
        (512, 128, 64, 8000.0),
        (1024, 256, 80, 22050.0),
        (960, 480, 40, 48000.0),
        (256, 96, 32, 16000.0),     # hop not a divisor of fft
    ],
)
def test_whisper_pipeline_any_config(fft, hop, n_mels, sr):
    rng = np.random.default_rng(0)
    samples = (rng.normal(size=int(sr)) * 0.2).astype(np.float32)

    pipe = WhisperMelPipeline(fft, hop, n_mels, sr, dtype=jnp.float64)
    got = np.asarray(pipe.mel_batch(samples))
    nf = framing.num_frames_batch(len(samples), fft, hop)
    assert got.shape == (nf, n_mels)

    # naive f64 check on a few frames
    window = hann_periodic(fft)
    filters = mel_filterbank(sr, fft, n_mels)
    half = fft // 2
    for k in [0, nf // 2, nf - 1]:
        frame = samples[k * hop : k * hop + fft].astype(np.float64)
        spec = np.fft.fft(frame * window)
        power = np.abs(spec[:half]) ** 2
        log_mel = np.log10(np.maximum(filters[:, :half] @ power, 1e-10))
        mmax = log_mel.max() - 8.0
        want = (np.maximum(log_mel, mmax) + 4.0) / 4.0
        np.testing.assert_allclose(got[k], want, atol=1e-9)


@pytest.mark.parametrize("fft,hop", [(400, 160), (1024, 256), (960, 480)])
def test_hp_path_any_config(fft, hop):
    rng = np.random.default_rng(1)
    samples = (rng.normal(size=48000) * 0.2).astype(np.float32)
    f64 = WhisperMelPipeline(fft, hop, 80, 16000.0, dtype=jnp.float64)
    hp = WhisperMelPipeline(fft, hop, 80, 16000.0, dtype=jnp.float32,
                            fft_impl="hp")
    a = np.asarray(f64.mel_batch(samples))
    b = np.asarray(hp.mel_batch(samples))
    assert np.abs(a - b).max() < 1e-6


def test_sharded_multistream_runs():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    from melspec_tpu.config import MelConfig
    from melspec_tpu.parallel import make_mesh
    from melspec_tpu.parallel.sharding import sharded_multistream

    mesh = make_mesh()
    multi, init_fn, push_fn = sharded_multistream(
        mesh, MelConfig(400, 160, 80, 16000.0), n_streams=16
    )
    state = init_fn()
    rng = np.random.default_rng(2)
    for step in range(4):
        chunks = jnp.asarray(
            (rng.normal(size=(16, 160)) * 0.2).astype(np.float32)
        )
        state, mels, valid = push_fn(state, chunks,
                                     jnp.ones(16, dtype=bool))
    assert mels.shape == (16, 80)
    assert bool(np.asarray(valid).all())  # window filled after 3 hops
    assert len(state.hop_buf.sharding.device_set) == 8


@pytest.mark.parametrize(
    "fft,hop,n_mels,sr",
    [
        (400, 160, 128, 16000.0),   # whisper large-v3 (128 mels)
        (512, 128, 64, 8000.0),
        (1024, 256, 80, 22050.0),
        (960, 480, 40, 48000.0),
        (256, 96, 32, 16000.0),     # hop not a divisor of fft
    ],
)
def test_sig_kernel_any_config(fft, hop, n_mels, sr):
    """The generalized-geometry fused kernel must cover the same broad
    config space as the XLA pipelines (interpret mode; the bf3 pipeline
    is the same-numerics reference)."""
    from melspec_tpu.ops.mel_kernel import sig_geometry, whisper_mel_sig

    assert sig_geometry(fft, hop, 0) is not None, (fft, hop)
    rng = np.random.default_rng(fft)
    samples = (rng.normal(size=int(sr)) * 0.2).astype(np.float32)
    got = np.asarray(whisper_mel_sig(samples, fft, hop, n_mels, sr,
                                     interpret=True))
    pipe = WhisperMelPipeline(fft, hop, n_mels, sr, dtype=jnp.float32,
                              fft_impl="bf3")
    want = np.asarray(pipe.mel_batch(samples))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_config_frequency_validation():
    """Descending mel grids must fail at construction, not produce silent
    garbage filterbanks downstream."""
    from melspec_tpu.config import BatchLogMelConfig, FbankConfig

    with pytest.raises(ValueError):
        BatchLogMelConfig(f_min=9000.0)       # > default Nyquist
    with pytest.raises(ValueError):
        BatchLogMelConfig(f_max=9000.0)       # > Nyquist
    with pytest.raises(ValueError):
        FbankConfig(low_freq=9000.0)
    with pytest.raises(ValueError):
        FbankConfig(frame_shift_ms=0.0)
    BatchLogMelConfig(f_min=20.0, f_max=7600.0)  # sane ranges still fine
    FbankConfig(low_freq=20.0, high_freq=7600.0)


def test_wav_reader_rejects_misdeclared_formats(testdata, tmp_path):
    """int16 PCM must not be silently frombuffer'd as float32 (and vice
    versa); unsupported widths raise instead of decoding garbage."""
    import struct

    from melspec_tpu.io.wav import read_wav_f32le, read_wav_mono

    with pytest.raises(ValueError):
        read_wav_f32le(testdata / "ten-vad" / "testset-audio-01.wav")

    # a 24-bit PCM file must be rejected, not decoded as int16 noise
    n = 300
    payload = b"\x00\x01\x02" * n
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 48000, 3, 24)
           + b"data" + struct.pack("<I", len(payload)))
    p = tmp_path / "pcm24.wav"
    p.write_bytes(hdr + payload)
    with pytest.raises(ValueError):
        read_wav_mono(p)


def test_sharded_serving_tick_runs():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    from melspec_tpu.config import DetectionSettings, MelConfig
    from melspec_tpu.parallel import make_mesh
    from melspec_tpu.parallel.sharding import sharded_serving
    from melspec_tpu.streaming.serving import MultiStreamFrontend

    mesh = make_mesh()
    front, init_fn, tick_fn = sharded_serving(
        mesh, MelConfig(400, 160, 80, 16000.0), n_streams=16,
        settings=DetectionSettings(min_energy=0.5, min_y=3, min_x=5),
    )
    state = init_fn()
    # unsharded single-device reference: identical bytes and decisions
    ref = MultiStreamFrontend(
        MelConfig(400, 160, 80, 16000.0), 16,
        settings=DetectionSettings(min_energy=0.5, min_y=3, min_x=5),
    )
    rstate = ref.init()
    rng = np.random.default_rng(11)
    for _ in range(3):
        chunks = (rng.normal(size=(16, 4, 160)) * 0.3).astype(np.float32)
        active = jnp.ones(16, dtype=bool)
        state, q, lo, hi, va, valid = tick_fn(state, jnp.asarray(chunks),
                                              active)
        rstate, rq, rlo, rhi, rva, rvalid = ref.push_many(rstate, chunks,
                                                          active)
        # the sharded program compiles to different fusions, so mel
        # values differ in the last ulp — bytes within one quantization
        # step, decisions with a 1-frame straddle budget (a sharding
        # bug would flip many frames, an ulp at most isolated ones)
        assert int(np.sum(np.asarray(va) != rva)) <= 1
        np.testing.assert_array_equal(np.asarray(valid), rvalid)
        np.testing.assert_allclose(np.asarray(lo), rlo, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hi), rhi, atol=1e-5)
        assert np.abs(np.asarray(q).astype(int) - rq.astype(int)).max() <= 1


def test_sharded_source_rate_serving_tick_runs():
    """sharded_serving(input_rate=...): the on-device-resampling tick
    (SourceRateFrontend) over the mesh matches its own single-device
    run — bytes within one quantization step."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    from melspec_tpu.config import DetectionSettings, MelConfig
    from melspec_tpu.parallel import make_mesh
    from melspec_tpu.parallel.sharding import sharded_serving
    from melspec_tpu.streaming.serving import SourceRateFrontend

    mesh = make_mesh()
    settings = DetectionSettings(min_energy=0.5, min_y=3, min_x=5)
    front, init_fn, tick_fn = sharded_serving(
        mesh, MelConfig(400, 160, 80, 16000.0), n_streams=16,
        settings=settings, input_rate=48000,
    )
    state = init_fn()
    ref = SourceRateFrontend(MelConfig(400, 160, 80, 16000.0), 16,
                             input_rate=48000, settings=settings)
    rstate = ref.init()
    rng = np.random.default_rng(13)
    for _ in range(3):
        chunks = (rng.normal(size=(16, 4, front.hop_src)) * 0.3
                  ).astype(np.float32)
        active = jnp.ones(16, dtype=bool)
        state, q, lo, hi, va, valid = tick_fn(state, jnp.asarray(chunks),
                                              active)
        rstate, rq, rlo, rhi, rva, rvalid = ref.push_many(rstate, chunks,
                                                          active)
        assert int(np.sum(np.asarray(va) != rva)) <= 1
        np.testing.assert_array_equal(np.asarray(valid), rvalid)
        assert np.abs(np.asarray(q).astype(int) - rq.astype(int)).max() <= 1


def test_sharded_serving_checkpoint_resume(tmp_path):
    """Checkpoint/resume at scale-out: save gathers the sharded fleet
    state; resume re-applies the shardings derived from a live state
    (``tree_map(lambda a: a.sharding, state)``) and continues
    bit-identically on the mesh."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    from melspec_tpu.config import DetectionSettings, MelConfig
    from melspec_tpu.parallel import make_mesh
    from melspec_tpu.parallel.sharding import sharded_serving

    mesh = make_mesh()
    front, init_fn, tick_fn = sharded_serving(
        mesh, MelConfig(400, 160, 80, 16000.0), n_streams=16,
        settings=DetectionSettings(min_energy=0.5, min_y=3, min_x=5),
    )
    rng = np.random.default_rng(17)
    a = (rng.normal(size=(16, 4, 160)) * 0.3).astype(np.float32)
    b = (rng.normal(size=(16, 4, 160)) * 0.3).astype(np.float32)
    active = jnp.ones(16, dtype=bool)

    state = init_fn()
    state, *_ = tick_fn(state, jnp.asarray(a), active)
    front.save_state(tmp_path / "fleet.npz", state)
    _, *ref = tick_fn(state, jnp.asarray(b), active)

    shardings = jax.tree_util.tree_map(lambda x: x.sharding, state)
    resumed = jax.device_put(front.load_state(tmp_path / "fleet.npz"),
                             shardings)
    chex = jax.tree_util.tree_map(lambda x: x.sharding, resumed)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda s, t: s == t, shardings, chex))
    _, *got = tick_fn(resumed, jnp.asarray(b), active)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_load_audio_resamples_to_target(tmp_path):
    """``load_audio``: read a mono WAV at its native rate and resample to
    the target (librosa-load shape; the reference leaves rate conversion
    to the embedder). Validated ratios only; native passthrough when the
    rates already match or target is None."""
    import struct

    from melspec_tpu.io.wav import load_audio
    from melspec_tpu.ops.resample import resample_poly

    t = np.arange(48000 * 2, dtype=np.float32) / 48000
    tone = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    payload = tone.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 48000,
                                   48000 * 4, 4, 32)
           + b"data" + struct.pack("<I", len(payload)))
    p = tmp_path / "tone48k.wav"
    p.write_bytes(hdr + payload)

    got = load_audio(p)  # default target 16 kHz
    want = np.asarray(resample_poly(tone, 1, 3), dtype=np.float32)
    assert got.shape == want.shape == (32000,)
    np.testing.assert_array_equal(got, want)

    native = load_audio(p, target_rate=None)
    np.testing.assert_array_equal(native, tone)
    same = load_audio(p, target_rate=48000)
    np.testing.assert_array_equal(same, tone)
    with pytest.raises(ValueError, match="polyphase matrix"):
        load_audio(p, target_rate=44101)  # coprime: unbounded matrix


def test_load_audio_downmixes_stereo(tmp_path):
    """Stereo files downmix to the channel mean; read_wav_mono still
    rejects them (explicit is better for the parity readers)."""
    import struct

    from melspec_tpu.io.wav import load_audio, read_wav, read_wav_mono

    left = (0.2 * np.sin(np.arange(16000) / 30)).astype(np.float32)
    right = (0.1 * np.cos(np.arange(16000) / 17)).astype(np.float32)
    inter = np.empty(32000, np.float32)
    inter[0::2], inter[1::2] = left, right
    payload = inter.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 16000,
                                   16000 * 8, 8, 32)
           + b"data" + struct.pack("<I", len(payload)))
    p = tmp_path / "stereo.wav"
    p.write_bytes(hdr + payload)

    data, rate = read_wav(p)
    assert data.shape == (16000, 2) and rate == 16000
    np.testing.assert_array_equal(data[:, 0], left)
    np.testing.assert_array_equal(data[:, 1], right)

    got = load_audio(p)
    want = ((left.astype(np.float64) + right) / 2).astype(np.float32)
    np.testing.assert_array_equal(got, want)

    with pytest.raises(ValueError, match="not mono"):
        read_wav_mono(p)
