"""SpeechToMel service object: result-shape contract and cadence
(reference ``src/wasm.rs:95-145``)."""

import numpy as np

from melspec_tpu.streaming.speech_to_mel import SpeechToMel


def test_result_shape_and_cadence():
    stm = SpeechToMel(fft_size=400, hop_size=160, sampling_rate=16000.0,
                      n_mels=80)
    rng = np.random.default_rng(0)

    # sub-hop push: not ok
    out = stm.add(rng.normal(size=100).astype(np.float32) * 0.3)
    assert out == {"ok": False}

    emitted = []
    for _ in range(40):
        out = stm.add(rng.normal(size=160).astype(np.float32) * 0.3)
        if out["ok"]:
            emitted.append(out)

    assert emitted, "window never filled"
    first = emitted[0]
    assert first["frame"].dtype == np.uint8 and first["frame"].shape == (80,)
    assert first["min"] < first["max"]
    assert isinstance(first["ms"], int)
    # idx advances one per consumed hop
    idxs = [e["idx"] for e in emitted]
    assert idxs == list(range(idxs[0], idxs[0] + len(idxs)))
    # VAD decisions appear once min_x frames accumulate
    assert any("va" in e for e in emitted)


def test_quantized_frame_is_unnormalized_log_mel(jfk_samples):
    """The emitted frame quantizes the raw log10 mel (the reference ships
    the unnormalized projection; norm is only for the VAD path)."""
    from melspec_tpu.ops.quant import dequantize, QuantizationRange
    from melspec_tpu.ops.spectrogram import compute_streaming_mel

    stm = SpeechToMel()
    outs = []
    for off in range(0, 16000, 160):
        out = stm.add(jfk_samples[off : off + 160])
        if out["ok"]:
            outs.append(out)
    frame = outs[0]
    log_mel = dequantize(
        frame["frame"], QuantizationRange(frame["min"], frame["max"])
    )
    # raw log10 values live in [-10, ~2]; normalized would be [-1.5, ~1.5]
    assert log_mel.min() <= -4.0


def test_get_flush():
    stm = SpeechToMel()
    out = stm.get()
    assert out == {"ok": False}


def test_pending_backlog_drains_with_vad_continuity():
    """Large pushes buffer beyond one hop; pending exposes the backlog and
    get() drains it while still feeding the VAD (a vad=False drain would
    desynchronize the detector's sliding window)."""
    import numpy as np

    from melspec_tpu.streaming.speech_to_mel import SpeechToMel

    s = SpeechToMel()
    rng = np.random.default_rng(0)
    s.add(rng.normal(size=4096).astype(np.float32) * 0.3)
    assert s.pending == 4096 // 160 - 1
    emitted = 1
    while s.pending:
        r = s.get()
        emitted += 1
    assert s.pending == 0
    assert emitted == 4096 // 160
    # the detector consumed every emitted frame (window stays contiguous):
    # frames seen by the VAD == frames emitted past the window fill
    emitted_ok = s._idx  # hops consumed
    assert s._vad._frame_index == max(0, emitted_ok - 400 // 160)
