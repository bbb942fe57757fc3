"""Device serving tick (streaming/serving.py): the batched streaming-VAD
protocol and per-frame quantization must match the host-side reference
path (per-slot VoiceActivityDetector + ops.quant.quantize) exactly —
they replace it inside examples/serve_streams.py, whose wire records the
browser-bridge test requires byte-identical."""

import numpy as np
import jax.numpy as jnp
import pytest

from melspec_tpu.config import DetectionSettings, MelConfig
from melspec_tpu.ops.quant import quantize, quantize_frames_jnp
from melspec_tpu.streaming.multistream import MultiStreamMel
from melspec_tpu.streaming.serving import (MultiStreamFrontend,
                                           MultiStreamVad)
from melspec_tpu.streaming.vad import VoiceActivityDetector


def _mel_like(rng, s, h, m):
    """Speech-shaped mel values: smooth base + occasional sharp edges so
    Sobel decisions exercise both outcomes."""
    base = rng.normal(size=(s, h, m)) * 0.05
    edges = (rng.random((s, h, m)) < 0.08) * rng.normal(size=(s, h, m)) * 3.0
    return (base + edges).astype(np.float32)


def test_quantize_frames_matches_host_bytes():
    rng = np.random.default_rng(0)
    frames = rng.normal(size=(4, 7, 80)).astype(np.float32) * 2.0
    frames[1, 3] = 0.625  # degenerate range: max == min -> NaN chain -> 0
    frames[2, 0] = np.linspace(-1, 1, 80, dtype=np.float32)
    q, lo, hi = quantize_frames_jnp(jnp.asarray(frames))
    q, lo, hi = np.asarray(q), np.asarray(lo), np.asarray(hi)
    for i in range(frames.shape[0]):
        for j in range(frames.shape[1]):
            want_q, want_rng = quantize(frames[i, j])
            np.testing.assert_array_equal(q[i, j], want_q)
            assert lo[i, j] == np.float32(want_rng.min)
            assert hi[i, j] == np.float32(want_rng.max)


@pytest.mark.parametrize("settings", [
    DetectionSettings(),
    DetectionSettings(min_energy=0.5, min_y=3, min_x=3, min_mel=0),
    DetectionSettings(min_energy=0.2, min_y=2, min_x=7, min_mel=5),
])
def test_multistream_vad_matches_host_protocol(settings):
    """Feeding each stream's VALID frames in order into the reference
    frame-at-a-time VoiceActivityDetector must reproduce the device
    decisions bit-for-bit (None -> False), across warm-up, ragged
    validity prefixes, varying push widths and resets."""
    rng = np.random.default_rng(settings.min_x)
    s, m = 3, 32
    vad = MultiStreamVad(settings, n_streams=s, n_mels=m)
    state = vad.init()
    hosts = [VoiceActivityDetector(settings) for _ in range(s)]

    for step, h in enumerate([1, 4, 2, 9, 1, 5]):
        mels = _mel_like(rng, s, h, m)
        # structural validity: an invalid PREFIX per stream (warm-up),
        # shrinking over time; stream 2 sits out push 2 entirely
        valid = np.ones((s, h), dtype=bool)
        lead = max(0, 2 - step)
        valid[0, :min(lead, h)] = False
        valid[1, :min(2 * lead, h)] = False
        if step == 2:
            valid[2, :] = False
        state, va = vad.push(state, mels, valid)
        for i in range(s):
            for t in range(h):
                if not valid[i, t]:
                    assert not va[i, t]
                    continue
                want = hosts[i].add(mels[i, t][:, None])
                assert va[i, t] == bool(want), (
                    f"settings={settings} stream={i} push={step} hop={t}"
                )

    # reset one stream: its protocol restarts from scratch
    state = vad.reset(state, np.asarray([False, True, False]))
    hosts[1] = VoiceActivityDetector(settings)
    mels = _mel_like(rng, s, 6, m)
    valid = np.ones((s, 6), dtype=bool)
    state, va = vad.push(state, mels, valid)
    for i in range(s):
        for t in range(6):
            want = hosts[i].add(mels[i, t][:, None])
            assert va[i, t] == bool(want), f"post-reset stream={i} hop={t}"


def test_frontend_tick_matches_host_pipeline():
    """MultiStreamFrontend's one-dispatch tick == MultiStreamMel bulk push
    followed by the host per-frame quantize + per-slot VAD — the exact
    equivalence serve_streams.py relies on for record stability."""
    config = MelConfig(400, 160, 80, 16000.0)
    settings = DetectionSettings(min_energy=0.5, min_y=3, min_x=5)
    s = 4
    front = MultiStreamFrontend(config, s, settings=settings)
    ref_mel = MultiStreamMel(config, s)
    fstate = front.init()
    rstate = ref_mel.init()
    hosts = [VoiceActivityDetector(settings) for _ in range(s)]

    rng = np.random.default_rng(7)
    va_checked, va_mismatch = 0, 0
    for h in (3, 4, 4, 2):
        chunks = (rng.normal(size=(s, h, config.hop_size)) * 0.3
                  ).astype(np.float32)
        active = np.ones(s, dtype=bool)
        if h == 2:
            active[3] = False
        fstate, q, lo, hi, va, valid = front.push_many(fstate, chunks,
                                                       active)
        rstate, mels, rvalid = ref_mel.push_many(rstate, chunks, active)
        np.testing.assert_array_equal(valid, rvalid)
        for i in range(s):
            for t in range(h):
                if not valid[i, t]:
                    continue
                # the fused tick and the standalone mel push are two
                # separately compiled XLA programs — fusion differences
                # can move mel values by an ulp, so bytes are held to
                # one quantization step, not bitwise (the bitwise claim
                # is test_quantize_frames_matches_host_bytes, same input
                # both sides)
                want_q, want_rng = quantize(mels[i, t])
                assert np.abs(q[i, t].astype(int)
                              - want_q.astype(int)).max() <= 1
                assert abs(lo[i, t] - np.float32(want_rng.min)) <= 1e-5
                assert abs(hi[i, t] - np.float32(want_rng.max)) <= 1e-5
                # the host detector sees the OTHER program's mel; an
                # ulp-level threshold straddle may flip an isolated
                # decision, but a wiring bug (frame offset, wrong
                # stream) flips many — budget 1 mismatch. Exact
                # same-input decision parity is pinned by
                # test_multistream_vad_matches_host_protocol.
                want_va = hosts[i].add(mels[i, t][:, None])
                va_checked += 1
                va_mismatch += int(va[i, t] != bool(want_va))
    assert va_checked > 30 and va_mismatch <= 1, (va_mismatch, va_checked)

    # empty push is a no-op
    fstate, q, lo, hi, va, valid = front.push_many(
        fstate, np.zeros((s, 0, config.hop_size), np.float32))
    assert q.shape == (s, 0, 80) and va.shape == (s, 0)

    # reset clears both mel and vad state for the masked stream
    fstate2 = front.reset(fstate, np.asarray([True, False, False, False]))
    assert int(np.asarray(fstate2.mel.idx)[0]) == 0
    assert int(np.asarray(fstate2.vad.count)[0]) == 0
    assert np.asarray(fstate2.vad.hist)[0].max() == 0.0
    assert int(np.asarray(fstate2.vad.count)[1]) > 0


def test_serving_input_validation():
    front = MultiStreamFrontend(MelConfig(400, 160, 80, 16000.0), 4)
    state = front.init()
    with pytest.raises(ValueError, match="chunks must be"):
        front.push_many(state, np.zeros((3, 2, 160), np.float32))
    with pytest.raises(ValueError, match="chunks must be"):
        front.push_many(state, np.zeros((4, 2, 100), np.float32))
    vad = MultiStreamVad(DetectionSettings(), 4, 80)
    with pytest.raises(ValueError, match="mels must be"):
        vad.push(vad.init(), np.zeros((3, 2, 80), np.float32),
                 np.ones((3, 2), bool))
    with pytest.raises(ValueError, match="min_x"):
        MultiStreamVad(DetectionSettings(min_x=2), 4, 80)
    with pytest.raises(ValueError, match="n_mels"):
        MultiStreamVad(DetectionSettings(), 4, 2)


def test_record_norm_log10_matches_reference_record():
    """record_norm='log10' must quantize the UNNORMALIZED log10 mel —
    the reference wasm wire record (src/wasm.rs:110-114 quantizes
    log_mel_spectrogram's output; its norm_mel call is commented out) —
    while VAD decisions stay identical to the default mode (the detector
    consumes normalized frames in both). Verified against an independent
    host re-derivation of the overlap-and-save log mel."""
    from melspec_tpu.ops import framing
    from melspec_tpu.ops.spectrogram import log_mel_from_power

    config = MelConfig(400, 160, 80, 16000.0)
    settings = DetectionSettings(min_energy=0.5, min_y=3, min_x=5)
    s, h = 3, 9
    front_log = MultiStreamFrontend(config, s, settings=settings,
                                    record_norm="log10")
    front_norm = MultiStreamFrontend(config, s, settings=settings)

    rng = np.random.default_rng(11)
    chunks = (rng.normal(size=(s, h, config.hop_size)) * 0.3
              ).astype(np.float32)
    st_l, q_l, lo_l, hi_l, va_l, valid_l = front_log.push_many(
        front_log.init(), chunks)
    st_n, q_n, lo_n, hi_n, va_n, valid_n = front_norm.push_many(
        front_norm.init(), chunks)

    np.testing.assert_array_equal(valid_l, valid_n)
    np.testing.assert_array_equal(va_l, va_n)  # VAD unaffected by units

    # independent expectation: frame the concat(zero hop_buf, chunks)
    # signal at offset=hop and project, WITHOUT whisper_norm
    signal = np.concatenate(
        [np.zeros((s, config.fft_size), np.float32),
         chunks.reshape(s, h * config.hop_size)], axis=1)
    frames = framing.frame_signal(jnp.asarray(signal), config.fft_size,
                                  config.hop_size, h,
                                  offset=config.hop_size)
    ref = front_log.mel
    log_mel = np.asarray(log_mel_from_power(
        ref._power(frames), ref.filters_t, jnp.float32))
    for i in range(s):
        for t in range(h):
            if not valid_l[i, t]:
                continue
            want_q, want_rng = quantize(log_mel[i, t])
            # separately-compiled programs: bytes to one step, range to
            # an ulp-scale tolerance (see test_frontend_tick docstring)
            assert np.abs(q_l[i, t].astype(int)
                          - want_q.astype(int)).max() <= 1
            assert abs(lo_l[i, t] - np.float32(want_rng.min)) <= 1e-5
            assert abs(hi_l[i, t] - np.float32(want_rng.max)) <= 1e-5
    # the two record modes really differ: log10 ranges are unnormalized
    # (min well below the whisper-norm floor of 0 for quiet frames)
    assert not np.allclose(lo_l[valid_l], lo_n[valid_n])

    # sig kernel normalizes in-kernel: log10 records are rejected there
    with pytest.raises(ValueError):
        MultiStreamFrontend(config, s, settings=settings,
                            fft_impl="sig", record_norm="log10")
    with pytest.raises(ValueError):
        MultiStreamFrontend(config, s, settings=settings,
                            record_norm="nope")
