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
