"""Polyphase resampler: scipy-parity, streaming prefix parity, signal quality.

Beyond-parity component (the reference crate has no resampler; its browser
demo delegates to the AudioContext) — semantics are pinned to
``scipy.signal.resample_poly`` instead, and the differential tests below
enforce them the same way the mel/fbank suites pin reference goldens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from melspec_tpu.ops.resample import (
    StreamingResampler,
    resample_filter,
    resample_output_len,
    resample_poly,
    validate_ratio,
)

# the ratios serving actually sees: 48k->16k, 44.1k->16k, 8k->16k, plus
# awkward coprime and reducible pairs
RATIOS = [(1, 3), (160, 441), (2, 1), (3, 2), (7, 5), (2, 6)]


def test_offline_matches_scipy_f64():
    ss = pytest.importorskip("scipy.signal")
    rng = np.random.default_rng(0)
    for up, down in RATIOS:
        for n in [1, 17, 1000, 1603]:
            x = rng.standard_normal(n)
            ref = ss.resample_poly(x, up, down)
            got = np.asarray(resample_poly(x, up, down))
            assert got.shape == ref.shape
            scale = np.max(np.abs(ref))
            assert np.max(np.abs(got - ref)) <= 1e-12 * scale, (up, down, n)


def test_offline_batch_axes_and_f32():
    ss = pytest.importorskip("scipy.signal")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 2, 800)).astype(np.float32)
    got = np.asarray(resample_poly(x, 160, 441))
    assert got.dtype == np.float32
    ref = ss.resample_poly(x.astype(np.float64), 160, 441, axis=-1)
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-5


def test_filter_matches_scipy_design():
    sig = pytest.importorskip("scipy.signal")
    for up, down in [(1, 3), (160, 441), (2, 1)]:
        max_rate = max(up, down)
        ref = sig.firwin(2 * 10 * max_rate + 1, 1.0 / max_rate,
                         window=("kaiser", 5.0)) * up
        got = resample_filter(up, down)
        assert np.max(np.abs(got - ref)) < 1e-14


def test_output_len_and_edges():
    assert resample_output_len(0, 1, 3) == 0
    assert resample_output_len(10, 1, 3) == 4      # ceil(10/3)
    assert resample_output_len(10, 160, 441) == 4  # ceil(1600/441)
    assert resample_output_len(10, 2, 6) == 4      # reduces to 1/3
    assert resample_poly(np.zeros(0), 1, 3).shape == (0,)
    x = np.arange(5, dtype=np.float64)
    np.testing.assert_array_equal(np.asarray(resample_poly(x, 3, 3)), x)
    with pytest.raises(ValueError):
        resample_poly(x, 0, 3)
    with pytest.raises(ValueError):
        StreamingResampler(1, 0)


def test_validate_ratio_bounds_untrusted_rates():
    """Serving boundaries gate client rates through validate_ratio: every
    standard audio-rate pair passes (reduced), while a coprime hostile
    pair — whose polyphase matrix would be gigabytes of host f64 — and
    non-positive values raise."""
    standards = [8000, 11025, 16000, 22050, 24000, 32000, 44100, 48000,
                 88200, 96000, 176400, 192000]
    for a in standards:
        for b in standards:
            up, down = validate_ratio(a, b)
            assert up * down + 20 * max(up, down) <= 1 << 20
            assert a * down == b * up  # reduced, same ratio
    # hostile: coprime pairs, and an extreme decimation whose matrix is
    # dominated by the 20*max filter-length term rather than up*down
    for bad in [(16000, 44101), (16000, 48001), (1, 2_000_000),
                (1, 100_000)]:
        with pytest.raises(ValueError):
            validate_ratio(*bad)
    for bad in [(0, 3), (3, 0), (-16000, 48000)]:
        with pytest.raises(ValueError):
            validate_ratio(*bad)


def test_sharded_batch_resample_matches_single_device():
    """Ingest resampling scales out like every other frontend op: a
    batch-sharded resample over the 8-device mesh equals the
    single-device result (the strided conv is batch-parallel, so the
    sharding needs no collectives)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from melspec_tpu.parallel import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(7)
    x = (rng.normal(size=(16, 4800)) * 0.3).astype(np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("batch", None)))
    fn = jax.jit(lambda v: resample_poly(v, 1, 3),
                 out_shardings=NamedSharding(mesh, P("batch", None)))
    got = fn(xs)
    assert len(got.sharding.device_set) == 8
    want = np.asarray(resample_poly(x, 1, 3))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_int_input_filters_in_float():
    y = np.asarray(resample_poly(np.arange(100, dtype=np.int32), 1, 2))
    assert jnp.issubdtype(y.dtype, jnp.floating)
    assert y.shape == (50,)


def test_jit_and_vmap():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 900)).astype(np.float32)
    f = jax.jit(lambda a: resample_poly(a, 1, 3))
    direct = np.asarray(resample_poly(x, 1, 3))
    assert np.allclose(np.asarray(f(x)), direct, atol=1e-6)
    vm = np.asarray(jax.vmap(lambda a: resample_poly(a, 1, 3))(x))
    assert np.allclose(vm, direct, atol=1e-6)


def test_streaming_prefix_parity_random_chunks():
    rng = np.random.default_rng(3)
    for up, down in RATIOS:
        x = rng.standard_normal(5000)
        off = np.asarray(resample_poly(x, up, down))
        sr = StreamingResampler(up, down, dtype=np.float64)
        outs, i = [], 0
        while i < len(x):
            c = int(rng.integers(1, 700))
            out = sr.push(x[i:i + c])
            i += c
            # every mid-stream emission is a prefix of the offline result
            outs.append(out)
            done = sum(map(len, outs))
            assert done <= len(off)
        outs.append(sr.flush())
        y = np.concatenate(outs)
        assert y.shape == off.shape, (up, down)
        scale = np.max(np.abs(off))
        assert np.max(np.abs(y - off)) <= 1e-12 * scale, (up, down)


def test_streaming_flush_resets_for_next_stream():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(2000)
    off = np.asarray(resample_poly(x, 1, 3))
    sr = StreamingResampler(1, 3, dtype=np.float64)
    for _ in range(2):  # the same stream twice through one instance
        y = np.concatenate([sr.push(x), sr.flush()])
        np.testing.assert_allclose(y, off, atol=1e-14)


def test_streaming_identity_passthrough():
    sr = StreamingResampler(16000, 16000)
    x = np.arange(7, dtype=np.float32)
    np.testing.assert_array_equal(sr.push(x), x)
    assert sr.flush().shape == (0,)


def test_tone_survives_48k_to_16k():
    """A 1 kHz tone sampled at 48 kHz, resampled to 16 kHz, must equal the
    directly-sampled 16 kHz tone away from the edges (the filter is
    zero-phase, so no delay compensation is needed)."""
    t48 = np.arange(48000) / 48000.0
    t16 = np.arange(16000) / 16000.0
    x = np.sin(2 * np.pi * 1000.0 * t48)
    y = np.asarray(resample_poly(x, 1, 3))
    want = np.sin(2 * np.pi * 1000.0 * t16)
    assert y.shape == want.shape
    interior = slice(100, -100)
    assert np.max(np.abs(y[interior] - want[interior])) < 2e-3


def test_mel_pipeline_on_resampled_audio(jfk_samples):
    """End-to-end: 16k JFK -> 48k -> back to 16k -> whisper mel stays close
    to the original's (the round trip is two half-band-clean filters)."""
    from melspec_tpu.ops.spectrogram import WhisperMelPipeline

    x = jfk_samples[: 16000 * 2].astype(np.float64)
    x48 = resample_poly(x, 3, 1)
    back = np.asarray(resample_poly(x48, 1, 3))[: len(x)]
    pipe = WhisperMelPipeline()
    a = np.asarray(pipe.mel_batch(jnp.asarray(x, jnp.float32)[None])[0])
    b = np.asarray(pipe.mel_batch(jnp.asarray(back, jnp.float32)[None])[0])
    # log-mel space: the whisper norm clamps to an 8-dB window / 4.  The
    # anti-alias filter's transition band straddles 8 kHz (cutoff =
    # Nyquist/3 at 48 kHz), so the top mel channels legitimately lose
    # energy; compare the channels below the transition band tightly and
    # only bound the rest.
    assert np.max(np.abs(a[:, :70] - b[:, :70])) < 0.02
    assert np.max(np.abs(a - b)) < 0.2


def test_lane_blocking_bounded_for_extreme_ratios():
    """A ratio that passes validate_ratio must never explode only because
    the MXU wants 128 output lanes: _lane_blocks halves m until the
    blocked matrix fits MAX_BLOCKED_ENTRIES (up=1/down=49000 would build
    a 7.4 GB matrix at m=128)."""
    from melspec_tpu.ops.resample import (MAX_BLOCKED_ENTRIES, _lane_blocks,
                                          validate_ratio)

    assert _lane_blocks(1, 3) == 128      # 48k -> 16k: full lanes
    assert _lane_blocks(1, 2) == 128
    assert _lane_blocks(160, 441) == 1    # up >= 128: no blocking needed
    validate_ratio(1, 49000)              # passes the m=1 bound...
    assert _lane_blocks(1, 49000) <= 2    # ...and must stay near-unblocked
    # (m=128 would be a 922M-entry, 7.4 GB build)
    # the bound itself holds for every blocking the selector returns
    for up, down in [(1, 3), (1, 2), (1, 320), (2, 3), (1, 49000),
                     (3, 1000), (1, 999)]:
        m = _lane_blocks(up, down)
        half = 10 * max(up, down)
        k1 = ((up - 1) * down + half) // up + half // up + 1
        assert m == 1 or ((m - 1) * down + k1) * up * m \
            <= MAX_BLOCKED_ENTRIES, (up, down, m)


def test_extreme_validated_ratio_runs_without_blocked_build():
    """End-to-end: a hostile-but-validated pure decimation completes on
    the m=1 path (the m=128 build would allocate gigabytes)."""
    from melspec_tpu.ops.resample import resample_poly

    x = np.zeros(98000, np.float32)
    y = np.asarray(resample_poly(x, 1, 49000))
    assert y.shape == (2,)


def test_streaming_resamplers_share_cast_matrix():
    """One f32 phase matrix per (ratio, beta, dtype), shared read-only
    across instances — a serving boundary builds one StreamingResampler
    PER CLIENT connection."""
    from melspec_tpu.ops.resample import StreamingResampler

    a = StreamingResampler(160, 441)
    b = StreamingResampler(160, 441)
    assert a._g is b._g
    assert not a._g.flags.writeable


def test_multistream_step_rejects_misaligned_chunks():
    """step() is the documented jit-composition entry point; a silent
    floor of n // down would misalign the stream's window grid forever."""
    import pytest

    from melspec_tpu.streaming.resample import MultiStreamResampler

    rs = MultiStreamResampler(1, 3, n_streams=2)
    state = rs.init()
    with pytest.raises(ValueError, match="multiple of down"):
        rs.step(state, jnp.zeros((2, 7)), jnp.ones(2, bool))
