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


def test_multistream_resampler_prefix_parity_and_reset():
    """Device batched streaming resampler == the host StreamingResampler
    per stream (after the documented hop-aligned spurious prefix), with
    a slot reset restarting the stream cleanly."""
    from melspec_tpu.ops.resample import StreamingResampler
    from melspec_tpu.streaming.resample import MultiStreamResampler

    rng = np.random.default_rng(11)
    for (up, down), impl in [((1, 3), "auto"), ((160, 441), "auto"),
                             ((2, 1), "auto"), ((1, 3), "frames"),
                             ((2, 1), "frames"), ((160, 441), "frames")]:
        s = 3
        mr = MultiStreamResampler(up, down, s, align=160, impl=impl)
        assert mr.spurious_out % 160 == 0 and mr.spurious_out > 0
        state = mr.init()
        streams = [(rng.normal(size=down * 720) * 0.3).astype(np.float32)
                   for _ in range(s)]
        outs = [[] for _ in range(s)]
        pos = [0] * s  # per-stream cursor (slot 2 restarts after reset)
        for t in range(3):
            chunk = np.stack([streams[i][pos[i]:pos[i] + down * 240]
                              for i in range(s)])
            pos = [p + down * 240 for p in pos]
            state, y = mr.push(state, chunk)
            for i in range(s):
                outs[i].append(y[i])
            if t == 1:
                # slot 2 is replaced by a NEW stream mid-run
                state = mr.reset(state, np.asarray([False, False, True]))
                streams[2] = (rng.normal(size=down * 720) * 0.3
                              ).astype(np.float32)
                outs[2], pos[2] = [], 0
        for i in range(s):
            got = np.concatenate(outs[i])[mr.spurious_out:]
            host = StreamingResampler(up, down)
            n_seen = down * 720 if i != 2 else down * 240
            ref = host.push(streams[i][:n_seen])
            m = min(len(got), len(ref))
            assert m > 0
            np.testing.assert_allclose(got[:m], ref[:m], atol=2e-6)

    with pytest.raises(ValueError, match="identity"):
        MultiStreamResampler(3, 3, 2)
    mr = MultiStreamResampler(1, 3, 2)
    with pytest.raises(ValueError, match="multiple of down"):
        mr.push(mr.init(), np.zeros((2, 100), np.float32))
    with pytest.raises(ValueError, match="n_streams"):
        mr.push(mr.init(), np.zeros((3, 99), np.float32))


def test_multistream_resampler_pallas_kernel_parity():
    """impl='kernel' (the Pallas slab-DMA resampler, interpret mode in
    CI) == the host StreamingResampler after each instance's own
    spurious prefix, across down-, up- and non-bumped-warm-up ratios;
    ineligible shapes raise instead of silently degrading."""
    from melspec_tpu.ops.resample import StreamingResampler
    from melspec_tpu.streaming.resample import MultiStreamResampler

    rng = np.random.default_rng(5)
    for up, down in [(1, 3), (2, 1), (1, 2)]:
        s = 8  # kernel needs S % 8 == 0
        mr = MultiStreamResampler(up, down, s, align=160, impl="kernel")
        n = down * 128 * 4  # q = 512: a 128-multiple window count
        stream = (rng.normal(size=(s, 2 * n)) * 0.3).astype(np.float32)
        state = mr.init()
        outs = []
        for t in range(2):
            state, y = mr.push(state, stream[:, t * n : (t + 1) * n])
            outs.append(y)
        got = np.concatenate(outs, axis=-1)[:, mr.spurious_out :]
        for i in range(s):
            ref = StreamingResampler(up, down).push(stream[i])
            m = min(got.shape[1], len(ref))
            assert m > 0
            np.testing.assert_allclose(got[i, :m], ref[:m], atol=2e-6)

    # 44.1 k: the 441-sample stride has no sane kernel geometry
    mr = MultiStreamResampler(160, 441, 8, align=160, impl="kernel")
    with pytest.raises(ValueError, match="no Pallas geometry"):
        mr.push(mr.init(), np.zeros((8, 441 * 128), np.float32))
    # ragged q (not a 128-multiple of windows) is ineligible too
    mr = MultiStreamResampler(1, 3, 8, align=160, impl="kernel")
    with pytest.raises(ValueError, match="no Pallas geometry"):
        mr.push(mr.init(), np.zeros((8, 3 * 100), np.float32))


def test_multistream_resampler_pair_kernel_bit_parity():
    """The two-input slab kernel (``pallas_resample_pair``: carried buf
    and chunks DMA'd separately, no materialized signal concat) is
    BIT-identical to ``pallas_resample`` over the explicit concat — the
    slabs hold the same floats, so the dots must too. Covers a
    multi-tile grid (t>0 slabs DMA straight from chunks at offset
    ``t*q_tile*stride - L``), single-tile boundary-straddle shapes, and
    both numerics; and confirms the streaming step actually rides the
    pair path (no concat fallback) at these shapes."""
    from melspec_tpu.ops.resample import (pair_eligible, pallas_resample,
                                          pallas_resample_pair)
    from melspec_tpu.streaming.resample import MultiStreamResampler

    rng = np.random.default_rng(17)
    cases = [(1, 3, 128 * 256, None),   # n_t = 2: offset DMA from chunks
             (1, 3, 512, None),         # n_t = 1: straddle slab only
             (2, 1, 512, "bf3"),
             (1, 2, 512, None)]
    for up, down, q, prec in cases:
        mr = MultiStreamResampler(up, down, 8, align=160, impl="kernel",
                                  precision=prec or "highest")
        L = mr._len
        n = q * down
        assert pair_eligible(L, n, up, down, q, mr.beta)
        buf = jnp.asarray((rng.normal(size=(8, L)) * 0.3), jnp.float32)
        chunks = jnp.asarray((rng.normal(size=(8, n)) * 0.3), jnp.float32)
        a = pallas_resample_pair(buf, chunks, up, down, q,
                                 precision=prec, interpret=True)
        b = pallas_resample(jnp.concatenate([buf, chunks], axis=1),
                            up, down, q, precision=prec, interpret=True)
        assert np.array_equal(np.asarray(a), np.asarray(b)), (up, down, q)
        # the streaming step returns exactly the pair kernel's output
        # and carries exactly the chunk tail
        state = mr.init()._replace(buf=buf)
        new_state, y = mr._step_jit(state, chunks,
                                    jnp.ones(8, dtype=bool))
        assert np.array_equal(np.asarray(y), np.asarray(a))
        assert np.array_equal(np.asarray(new_state.buf),
                              np.asarray(chunks[:, n - L:]))


def test_multistream_resampler_bf3_precision_parity():
    """precision='bf3' (3-pass bf16-slice dots, the SourceRateFrontend
    default) stays within the mel pipeline's 1e-5 class of the f64 host
    reference on BOTH the kernel path (interpret in CI) and the XLA
    conv fallback; bad precision strings are rejected at construction."""
    from melspec_tpu.ops.resample import StreamingResampler
    from melspec_tpu.streaming.resample import MultiStreamResampler

    rng = np.random.default_rng(11)
    for impl in ("kernel", "conv"):
        for up, down in [(1, 3), (2, 1)]:
            mr = MultiStreamResampler(up, down, 8, align=160, impl=impl,
                                      precision="bf3")
            n = down * 128 * 4
            stream = (rng.normal(size=(8, n)) * 0.3).astype(np.float32)
            _, y = mr.push(mr.init(), stream)
            got = np.asarray(y)[:, mr.spurious_out:]
            host = StreamingResampler(up, down, dtype=np.float64)
            ref = host.push(stream[0].astype(np.float64))
            m = min(got.shape[1], len(ref))
            assert m > 100
            scale = max(np.abs(ref).max(), 1e-30)
            assert np.abs(got[0, :m] - ref[:m]).max() <= 1e-5 * scale, (
                impl, up, down)

    with pytest.raises(ValueError, match="precision"):
        MultiStreamResampler(1, 3, 8, precision="fast")


def test_source_rate_frontend_matches_host_resampled_pipeline():
    """The composed source-rate tick (resample->mel->VAD->quant, one
    dispatch) produces, at every VALID frame, the same record a plain
    MultiStreamFrontend fed host-resampled audio produces ONE HOP
    EARLIER — the resampler's spurious warm-up prefix is exactly
    spurious_out/hop hops, so composed global hop g corresponds to plain
    hop g - spur_hops."""
    from melspec_tpu.ops.resample import resample_poly
    from melspec_tpu.streaming.serving import SourceRateFrontend

    config = MelConfig(400, 160, 80, 16000.0)
    settings = DetectionSettings(min_energy=0.5, min_y=3, min_x=5)
    s, hops, ticks = 3, 4, 6
    src = SourceRateFrontend(config, s, input_rate=48000,
                             settings=settings)
    plain = MultiStreamFrontend(config, s, settings=settings)
    spur_hops = src.rs.spurious_out // config.hop_size
    assert spur_hops >= 1

    rng = np.random.default_rng(5)
    x48 = (rng.normal(size=(s, ticks * hops * src.hop_src)) * 0.3
           ).astype(np.float32)
    y16 = np.asarray(resample_poly(x48, 1, 3)).astype(np.float32)

    sstate, pstate = src.init(), plain.init()
    gq, gva, gvalid = [], [], []
    pq, pva, pvalid = [], [], []
    for t in range(ticks):
        chunk = x48[:, t * hops * src.hop_src:(t + 1) * hops * src.hop_src]
        sstate, q, lo, hi, va, valid = src.push_many(
            sstate, chunk.reshape(s, hops, src.hop_src))
        gq.append(q), gva.append(va), gvalid.append(valid)
        pchunk = y16[:, t * hops * 160:(t + 1) * hops * 160]
        pstate, q, lo, hi, va, valid = plain.push_many(
            pstate, pchunk.reshape(s, hops, 160))
        pq.append(q), pva.append(va), pvalid.append(valid)
    gq = np.concatenate(gq, axis=1)          # [S, G, 80]
    gva = np.concatenate(gva, axis=1)
    gvalid = np.concatenate(gvalid, axis=1)  # [S, G]
    pq = np.concatenate(pq, axis=1)
    pva = np.concatenate(pva, axis=1)
    pvalid = np.concatenate(pvalid, axis=1)

    n_hops = ticks * hops
    # the spurious prefix makes the first spur_hops frames invalid...
    assert not gvalid[:, :spur_hops].any()
    # ...and shifts the grid: composed hop g == plain hop g - spur_hops
    np.testing.assert_array_equal(gvalid[:, spur_hops:],
                                  pvalid[:, :n_hops - spur_hops])
    checked, va_flips = 0, 0
    for g in range(spur_hops, n_hops):
        for i in range(s):
            if not gvalid[i, g]:
                continue
            checked += 1
            # two separately compiled programs + resample associativity:
            # bytes to one quantization step, decisions with a 1-flip
            # budget (same rationale as the fused-tick parity test above)
            assert np.abs(gq[i, g].astype(int)
                          - pq[i, g - spur_hops].astype(int)).max() <= 1
            va_flips += int(gva[i, g] != pva[i, g - spur_hops])
    assert checked > 40 and va_flips <= 1, (checked, va_flips)

    # reset: a reused slot restarts with the full warm-up (spurious
    # prefix + fft) — the next tick after reset emits no valid frames
    sstate = src.reset(sstate, np.asarray([True, False, False]))
    chunk = x48[:, :hops * src.hop_src]
    sstate, q, lo, hi, va, valid = src.push_many(
        sstate, chunk.reshape(s, hops, src.hop_src))
    assert not valid[0, : spur_hops + 1].any()
    assert valid[1].all()   # undisturbed streams stay warm

    # constructor validation: non-integral source hop
    with pytest.raises(ValueError, match="not a whole number"):
        SourceRateFrontend(config, s, input_rate=22050)
    with pytest.raises(ValueError, match="use MultiStreamFrontend"):
        SourceRateFrontend(config, s, input_rate=16000)
    with pytest.raises(ValueError, match="chunks must be"):
        src.push_many(sstate, np.zeros((s, 2, 160), np.float32))


def test_source_rate_frontend_upsampling_8k():
    """Telephony ingest (8 kHz -> 16 kHz, up=2/down=1): the UPSAMPLING
    source-rate tick holds the same frame-grid contract as the 48 kHz
    decimation test above — spurious prefix an exact hop multiple, then
    parity with a plain frontend fed host-resampled audio."""
    from melspec_tpu.ops.resample import resample_poly
    from melspec_tpu.streaming.serving import SourceRateFrontend

    config = MelConfig(400, 160, 80, 16000.0)
    settings = DetectionSettings(min_energy=0.5, min_y=3, min_x=5)
    s, hops, ticks = 2, 4, 6
    src = SourceRateFrontend(config, s, input_rate=8000,
                             settings=settings)
    assert src.hop_src == 80
    plain = MultiStreamFrontend(config, s, settings=settings)
    spur_hops = src.rs.spurious_out // config.hop_size
    assert spur_hops >= 1

    rng = np.random.default_rng(7)
    x8 = (rng.normal(size=(s, ticks * hops * 80)) * 0.3).astype(np.float32)
    y16 = np.asarray(resample_poly(x8, 2, 1)).astype(np.float32)

    sstate, pstate = src.init(), plain.init()
    gq, gvalid = [], []
    pq, pvalid = [], []
    for t in range(ticks):
        chunk = x8[:, t * hops * 80:(t + 1) * hops * 80]
        sstate, q, lo, hi, va, valid = src.push_many(
            sstate, chunk.reshape(s, hops, 80))
        gq.append(q), gvalid.append(valid)
        pchunk = y16[:, t * hops * 160:(t + 1) * hops * 160]
        pstate, q, lo, hi, va, valid = plain.push_many(
            pstate, pchunk.reshape(s, hops, 160))
        pq.append(q), pvalid.append(valid)
    gq = np.concatenate(gq, axis=1)
    gvalid = np.concatenate(gvalid, axis=1)
    pq = np.concatenate(pq, axis=1)
    pvalid = np.concatenate(pvalid, axis=1)

    n_hops = ticks * hops
    assert not gvalid[:, :spur_hops].any()
    np.testing.assert_array_equal(gvalid[:, spur_hops:],
                                  pvalid[:, :n_hops - spur_hops])
    checked = 0
    for g in range(spur_hops, n_hops):
        for i in range(s):
            if not gvalid[i, g]:
                continue
            checked += 1
            assert np.abs(gq[i, g].astype(int)
                          - pq[i, g - spur_hops].astype(int)).max() <= 1
    assert checked > 20, checked
