"""TEN-VAD harness: exact reproduction of the reference's published macro
metrics on the vendored 30-file testset (BASELINE.md: balanced default ->
macro P 0.8751 / R 0.8785 / F1 0.8566 / FPR 0.3946; reference
``doc/vad/README.md:73-75``)."""

import numpy as np
import pytest

from melspec_tpu.config import DetectionSettings
from melspec_tpu.utils.vad_eval import (
    EvalOptions,
    LabelSegment,
    TimedDecision,
    decisions_to_segments,
    evaluate_testset,
    label_at,
    macro_metrics,
    merge_close_segments,
    postprocess_decisions,
    read_labels,
)


def test_balanced_default_matches_published_metrics(testdata):
    testset = testdata / "ten-vad"
    if not testset.is_dir():
        pytest.skip("ten-vad testset not available")
    total, rows = evaluate_testset(testset, EvalOptions(), DetectionSettings())
    assert len(rows) == 30
    mm = macro_metrics(rows)
    assert round(mm["precision"], 4) == 0.8751
    assert round(mm["recall"], 4) == 0.8785
    assert round(mm["f1"], 4) == 0.8566
    assert round(mm["fpr"], 4) == 0.3946


def test_high_f1_preset_matches_published_metrics(testdata):
    """The reference's second published operating point — the high-F1
    sweep winner (``doc/vad/README.md:76``) — digit for digit."""
    from melspec_tpu.utils.vad_eval import preset

    testset = testdata / "ten-vad"
    if not testset.is_dir():
        pytest.skip("ten-vad testset not available")
    opts, settings = preset("high-f1")
    assert settings == DetectionSettings(min_energy=0.96, min_y=8,
                                         min_x=5, min_mel=4)
    assert (opts.min_speech_ms, opts.merge_gap_ms) == (200, 150)
    total, rows = evaluate_testset(testset, opts, settings)
    assert len(rows) == 30
    mm = macro_metrics(rows)
    assert round(mm["precision"], 4) == 0.8165
    assert round(mm["recall"], 4) == 0.9635
    assert round(mm["f1"], 4) == 0.8769
    assert round(mm["fpr"], 4) == 0.6459


# The reference's published per-file table for the balanced default
# (``doc/vad/README.md:96-127``, the mel-spec columns):
# file -> (duration_s, F1, precision, recall, FPR).
_PUBLISHED_PER_FILE = {
    "testset-audio-01.wav": (11.520, 0.9479, 0.9080, 0.9915, 0.4476),
    "testset-audio-02.wav": (4.045, 0.8386, 0.7221, 1.0000, 0.6599),
    "testset-audio-03.wav": (10.333, 0.9398, 1.0000, 0.8865, 0.0000),
    "testset-audio-04.wav": (10.333, 0.7408, 0.9460, 0.6088, 0.1840),
    "testset-audio-05.wav": (10.333, 0.9637, 0.9915, 0.9373, 0.0217),
    "testset-audio-06.wav": (10.333, 0.8921, 0.8053, 1.0000, 1.0000),
    "testset-audio-07.wav": (8.440, 0.8259, 0.8547, 0.7989, 0.2841),
    "testset-audio-08.wav": (9.600, 0.8458, 0.9815, 0.7430, 0.0655),
    "testset-audio-09.wav": (10.333, 0.7209, 0.7421, 0.7008, 0.7373),
    "testset-audio-10.wav": (10.333, 0.8829, 0.7939, 0.9944, 0.5755),
    "testset-audio-11.wav": (8.832, 0.9035, 1.0000, 0.8240, 0.0000),
    "testset-audio-12.wav": (4.790, 0.9171, 0.8731, 0.9658, 0.2265),
    "testset-audio-13.wav": (10.333, 0.9533, 1.0000, 0.9107, 0.0000),
    "testset-audio-14.wav": (6.805, 0.9492, 0.9414, 0.9572, 0.2319),
    "testset-audio-15.wav": (4.736, 0.8834, 0.7912, 1.0000, 0.7087),
    "testset-audio-16.wav": (10.240, 0.9590, 0.9630, 0.9550, 0.1792),
    "testset-audio-17.wav": (3.880, 0.9106, 0.8544, 0.9747, 0.4381),
    "testset-audio-18.wav": (7.296, 0.9715, 0.9653, 0.9778, 0.1033),
    "testset-audio-19.wav": (9.240, 0.8839, 0.7919, 1.0000, 1.0000),
    "testset-audio-20.wav": (10.333, 0.9597, 0.9579, 0.9614, 0.1768),
    "testset-audio-21.wav": (3.430, 0.8038, 0.6719, 1.0000, 0.8387),
    "testset-audio-22.wav": (14.080, 0.8618, 0.8075, 0.9241, 0.4411),
    "testset-audio-23.wav": (4.992, 0.8694, 0.7689, 1.0000, 0.9658),
    "testset-audio-24.wav": (6.440, 0.8176, 0.9701, 0.7065, 0.0562),
    "testset-audio-25.wav": (15.785, 0.9281, 1.0000, 0.8658, 0.0000),
    "testset-audio-26.wav": (10.333, 0.8622, 0.7578, 1.0000, 0.8696),
    "testset-audio-27.wav": (8.704, 0.8193, 0.6965, 0.9948, 0.8807),
    "testset-audio-28.wav": (7.168, 0.2634, 1.0000, 0.1517, 0.0000),
    "testset-audio-29.wav": (8.960, 0.9157, 0.8742, 0.9613, 0.4266),
    "testset-audio-30.wav": (10.333, 0.6683, 0.8212, 0.5633, 0.3193),
}


def test_balanced_default_per_file_table(testdata):
    """Every row of the reference's published 30-file table
    (``doc/vad/README.md:96-127``) digit for digit — any Sobel /
    smoothing / post-processing regression shows up as the exact file
    it broke on."""
    testset = testdata / "ten-vad"
    if not testset.is_dir():
        pytest.skip("ten-vad testset not available")
    total, rows = evaluate_testset(testset, EvalOptions(),
                                   DetectionSettings())
    assert len(rows) == len(_PUBLISHED_PER_FILE) == 30
    for row in rows:
        dur, f1, p, r, fpr = _PUBLISHED_PER_FILE[row.path.name]
        m = row.metrics
        got = (round(row.duration_s, 3), round(m.f1, 4),
               round(m.precision, 4), round(m.recall, 4),
               round(m.fpr, 4))
        assert got == (dur, f1, p, r, fpr), row.path.name


def test_label_parsing(testdata):
    labels = read_labels(testdata / "ten-vad" / "testset-audio-01.scv")
    assert len(labels) > 0
    assert all(seg.end > seg.start for seg in labels)
    assert label_at(labels, labels[0].start) == labels[0].speech


def test_decisions_to_segments():
    period = 0.01
    decisions = [TimedDecision(i * period, 3 <= i <= 6) for i in range(10)]
    segs = decisions_to_segments(decisions, period)
    assert len(segs) == 1
    assert segs[0].start == pytest.approx(0.03 - period / 2)
    assert segs[0].end == pytest.approx(0.07 - period / 2)


def test_merge_close_segments():
    segs = [LabelSegment(0.0, 1.0, True), LabelSegment(1.05, 2.0, True),
            LabelSegment(3.0, 4.0, True)]
    merged = merge_close_segments(segs, 0.1)
    assert len(merged) == 2
    assert merged[0].end == 2.0


def test_postprocess_drops_short_segments():
    period = 0.01
    decisions = [TimedDecision(i * period, i == 5) for i in range(20)]
    out = postprocess_decisions(decisions, period,
                                EvalOptions(min_speech_ms=100, merge_gap_ms=0))
    assert not any(d.speech for d in out)


def test_vectorized_postprocess_matches_sequential_fuzz():
    """_postprocess_mask (the batched evaluator's numpy fast path) must be
    decision-for-decision identical to postprocess_decisions across random
    decision streams and every post-processing knob combination."""
    import numpy as np

    from melspec_tpu.utils.vad_eval import (EvalOptions, TimedDecision,
                                            _labels_mask, _postprocess_mask,
                                            label_at, postprocess_decisions,
                                            LabelSegment)

    rng = np.random.default_rng(11)
    hop_s = 160 / 16000.0
    for trial in range(40):
        n = int(rng.integers(1, 400))
        speech = rng.random(n) < rng.uniform(0.05, 0.9)
        times = np.round((np.arange(n) * hop_s + 0.0125) * 1000) / 1000.0
        opts = EvalOptions(
            min_speech_ms=int(rng.choice([0, 50, 150, 400])),
            merge_gap_ms=int(rng.choice([0, 50, 150, 400])),
        )
        want = postprocess_decisions(
            [TimedDecision(float(t), bool(s))
             for t, s in zip(times, speech)], hop_s, opts)
        got = _postprocess_mask(speech, times, hop_s, opts)
        assert [bool(g) for g in got] == [d.speech for d in want], (
            trial, opts)

        # label mask vs scalar label_at, with overlapping segments to pin
        # first-match semantics
        segs = []
        for _ in range(int(rng.integers(0, 6))):
            a = float(rng.uniform(0, times[-1] + 0.1))
            b = a + float(rng.uniform(0, 1.5))
            segs.append(LabelSegment(a, b, bool(rng.random() < 0.7)))
        got_l = _labels_mask(segs, times)
        want_l = [label_at(segs, float(t)) for t in times]
        assert [bool(g) for g in got_l] == want_l, trial


def test_batched_eval_handles_clip_shorter_than_window(tmp_path, testdata):
    """A clip shorter than the detector window (< (min_x-1)*hop + fft
    samples) must produce an empty per-file result, like the sequential
    path — not garbage decisions from a negative slice bound."""
    import shutil
    import struct

    from melspec_tpu.config import DetectionSettings
    from melspec_tpu.utils.vad_eval import EvalOptions, evaluate_testset_batched

    src = sorted((testdata / "ten-vad").glob("*.wav"))[0]
    shutil.copy(src, tmp_path / "long.wav")
    shutil.copy(src.with_suffix(".scv"), tmp_path / "long.scv")
    # a 600-sample 16-bit mono wav (~37 ms): 2 frames < min_x=5
    n = 600
    payload = struct.pack(f"<{n}h", *([0] * n))
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
           + b"data" + struct.pack("<I", len(payload)))
    (tmp_path / "short.wav").write_bytes(hdr + payload)
    (tmp_path / "short.scv").write_text("short.wav,0.0,0.05,0\n")

    total, rows = evaluate_testset_batched(
        tmp_path, EvalOptions(), DetectionSettings())
    assert len(rows) == 2
    short_row = [r for r in rows if r.path.name == "short.wav"][0]
    assert short_row.metrics.total == 0  # no decisions, no crash
    assert total.total > 0               # the long clip still evaluated
