"""TEN-VAD evaluation harness.

Library core of the reference's ``vad_ten_eval`` example
(``examples/vad_ten_eval/src/main.rs``): per-file STFT -> whisper mel ->
VAD decisions with timestamps, decision thresholds, segment post-processing
(merge gaps, drop short segments), frame-level metrics against ``.scv``
labels, micro + macro aggregation, and RTF/RTFx accounting.

TPU-first difference: the reference feeds the detector one frame at a time
(``main.rs:253-274``); here the whole clip's mel image and every windowed
decision are computed in two vectorized passes
(``ops.spectrogram`` + ``ops.vad.streaming_decisions``) with identical
results.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from melspec_tpu.config import DetectionSettings
from melspec_tpu.io.wav import read_wav_mono
from melspec_tpu.ops.spectrogram import compute_mel_spectrogram


def preset(name: str) -> Tuple["EvalOptions", DetectionSettings]:
    """The reference's two published TEN-VAD operating points
    (``doc/vad/README.md:73-76``), as ``(EvalOptions, DetectionSettings)``:

    - ``"balanced"`` (the default preset): min_energy=0.98 min_y=11
      min_x=5 min_mel=2 min_speech=150ms merge_gap=150ms -> macro
      P 0.8751 / R 0.8785 / F1 0.8566 / FPR 0.3946.
    - ``"high-f1"`` (recall-leaning sweep winner): min_energy=0.96
      min_y=8 min_x=5 min_mel=4 min_speech=200ms merge_gap=150ms ->
      macro P 0.8165 / R 0.9635 / F1 0.8769 / FPR 0.6459. Use when
      missed speech costs more than extra non-speech audio.

    Both sets of macro digits are test-pinned (tests/test_vad_eval.py)
    on the vendored 30-file testset.
    """
    if name == "balanced":
        return EvalOptions(), DetectionSettings()
    if name == "high-f1":
        return (
            EvalOptions(min_speech_ms=200, merge_gap_ms=150),
            DetectionSettings(min_energy=0.96, min_y=8, min_x=5,
                              min_mel=4),
        )
    raise ValueError(f"unknown VAD preset {name!r}: balanced | high-f1")


@dataclasses.dataclass
class EvalOptions:
    fft_size: int = 400
    hop_size: int = 160
    n_mels: int = 80
    time_mode: str = "center"  # start | center | end
    min_leading_active_columns: int = 1
    min_active_columns: int = 1
    min_confidence: float = 0.0
    min_speech_ms: int = 150
    merge_gap_ms: int = 150


@dataclasses.dataclass
class LabelSegment:
    start: float
    end: float
    speech: bool


@dataclasses.dataclass
class TimedDecision:
    time_s: float
    speech: bool


@dataclasses.dataclass
class Metrics:
    tp: int = 0
    fp: int = 0
    tn: int = 0
    fn: int = 0

    def add(self, predicted: bool, expected: bool) -> None:
        if predicted and expected:
            self.tp += 1
        elif predicted and not expected:
            self.fp += 1
        elif not predicted and not expected:
            self.tn += 1
        else:
            self.fn += 1

    def merge(self, other: "Metrics") -> None:
        self.tp += other.tp
        self.fp += other.fp
        self.tn += other.tn
        self.fn += other.fn

    @property
    def total(self) -> int:
        return self.tp + self.fp + self.tn + self.fn

    @staticmethod
    def _ratio(num: int, den: int) -> float:
        return num / den if den else 0.0

    @property
    def precision(self) -> float:
        return self._ratio(self.tp, self.tp + self.fp)

    @property
    def recall(self) -> float:
        return self._ratio(self.tp, self.tp + self.fn)

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if p + r else 0.0

    @property
    def accuracy(self) -> float:
        return self._ratio(self.tp + self.tn, self.total)

    @property
    def fpr(self) -> float:
        return self._ratio(self.fp, self.fp + self.tn)

    @property
    def fnr(self) -> float:
        return self._ratio(self.fn, self.fn + self.tp)


def read_labels(path: Path) -> List[LabelSegment]:
    """Parse a TEN-VAD ``.scv`` label file: ``name,start,end,flag,...``
    triplets (reference ``main.rs:305-322``)."""
    fields = path.read_text().strip().split(",")
    if len(fields) < 4 or (len(fields) - 1) % 3 != 0:
        raise ValueError(f"bad label file format: {path}")
    out = []
    rest = fields[1:]
    for i in range(0, len(rest), 3):
        out.append(
            LabelSegment(
                start=float(rest[i]),
                end=float(rest[i + 1]),
                speech=int(rest[i + 2]) == 1,
            )
        )
    return out


def label_at(labels: Sequence[LabelSegment], time_s: float) -> bool:
    for seg in labels:
        if seg.start <= time_s < seg.end:
            return seg.speech
    return False


def decisions_to_segments(
    decisions: Sequence[TimedDecision], half_width_s: float
) -> List[LabelSegment]:
    out: List[LabelSegment] = []
    open_start: Optional[float] = None
    for d in decisions:
        if d.speech and open_start is None:
            open_start = max(d.time_s - half_width_s / 2.0, 0.0)
        elif not d.speech and open_start is not None:
            out.append(LabelSegment(open_start,
                                    max(d.time_s - half_width_s / 2.0, open_start),
                                    True))
            open_start = None
    if open_start is not None and decisions:
        out.append(LabelSegment(open_start,
                                decisions[-1].time_s + half_width_s / 2.0, True))
    return out


def merge_close_segments(
    segments: Sequence[LabelSegment], merge_gap_s: float
) -> List[LabelSegment]:
    merged: List[LabelSegment] = []
    for seg in segments:
        if merged and seg.start - merged[-1].end <= merge_gap_s:
            merged[-1].end = max(merged[-1].end, seg.end)
        else:
            merged.append(LabelSegment(seg.start, seg.end, True))
    return merged


def postprocess_decisions(
    decisions: List[TimedDecision], frame_period_s: float, opts: EvalOptions
) -> List[TimedDecision]:
    if not decisions or (opts.min_speech_ms == 0 and opts.merge_gap_ms == 0):
        return decisions
    segments = decisions_to_segments(decisions, frame_period_s)
    if opts.merge_gap_ms > 0:
        segments = merge_close_segments(segments, opts.merge_gap_ms / 1000.0)
    if opts.min_speech_ms > 0:
        min_s = opts.min_speech_ms / 1000.0
        segments = [s for s in segments if s.end - s.start >= min_s]
    return [
        TimedDecision(
            d.time_s,
            any(s.start <= d.time_s < s.end for s in segments),
        )
        for d in decisions
    ]


def _postprocess_mask(
    speech: np.ndarray, times_s: np.ndarray, frame_period_s: float,
    opts: EvalOptions,
) -> np.ndarray:
    """Vectorized ``postprocess_decisions`` over a whole file's decisions.

    Bit-identical to the sequential helper (run-length segments -> merge ->
    min-length filter -> point-in-segment test) but numpy end-to-end — the
    per-decision Python objects were the dominant cost of the batched
    evaluator once the device pass became one dispatch.
    """
    n = speech.shape[0]
    if n == 0 or (opts.min_speech_ms == 0 and opts.merge_gap_ms == 0):
        return speech
    h2 = frame_period_s / 2.0
    s8 = speech.astype(np.int8)
    rise = np.flatnonzero(np.diff(s8) == 1) + 1      # False -> True
    fall = np.flatnonzero(np.diff(s8) == -1) + 1     # True -> False
    if speech[0]:
        rise = np.concatenate([[0], rise])
    starts = np.maximum(times_s[rise] - h2, 0.0)
    ends = np.empty_like(starts)
    n_closed = len(fall)
    ends[:n_closed] = np.maximum(times_s[fall] - h2, starts[:n_closed])
    if len(starts) > n_closed:  # trailing open segment
        ends[-1] = times_s[-1] + h2
    segments = [LabelSegment(float(a), float(b), True)
                for a, b in zip(starts, ends)]
    if opts.merge_gap_ms > 0:
        segments = merge_close_segments(segments, opts.merge_gap_ms / 1000.0)
    if opts.min_speech_ms > 0:
        min_s = opts.min_speech_ms / 1000.0
        segments = [s for s in segments if s.end - s.start >= min_s]
    if not segments:
        return np.zeros(n, dtype=bool)
    seg_start = np.asarray([s.start for s in segments])
    seg_end = np.asarray([s.end for s in segments])
    # merged segments are sorted and disjoint: point-in-segment by bisect
    k = np.searchsorted(seg_start, times_s, side="right") - 1
    return (k >= 0) & (times_s < seg_end[np.maximum(k, 0)])


def _labels_mask(labels: Sequence[LabelSegment],
                 times_s: np.ndarray) -> np.ndarray:
    """Vectorized ``label_at`` (first-matching-segment semantics)."""
    expected = np.zeros(times_s.shape[0], dtype=bool)
    assigned = np.zeros_like(expected)
    for seg in labels:
        m = ~assigned & (times_s >= seg.start) & (times_s < seg.end)
        expected[m] = seg.speech
        assigned |= m
    return expected


def _bucket_pad(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """Zero-pad to the next power-of-two second count so jit caches hit
    across a testset of ragged clip lengths. Exact: padding only adds
    frames beyond the kept ``num_frames(len)`` — every kept frame reads
    original samples only."""
    n = len(samples)
    bucket = sample_rate
    while bucket < n:
        bucket <<= 1
    return np.pad(samples, (0, bucket - n))


def evaluate_file(
    samples: np.ndarray,
    sample_rate: int,
    labels: Sequence[LabelSegment],
    opts: EvalOptions,
    settings: DetectionSettings,
) -> Tuple[Metrics, List[TimedDecision]]:
    """Frame decisions + metrics for one clip (reference ``main.rs:232-285``)."""
    from melspec_tpu.ops.framing import num_frames_batch

    n_frames = num_frames_batch(len(samples), opts.fft_size, opts.hop_size)
    padded = _bucket_pad(np.asarray(samples, np.float32), sample_rate)
    mel = compute_mel_spectrogram(
        padded, opts.fft_size, opts.hop_size, opts.n_mels, float(sample_rate)
    ).T[:, :n_frames]  # [n_mels, frames], per-frame whisper norm

    from melspec_tpu.ops.vad import streaming_decision_fields

    fields = streaming_decision_fields(mel.astype(np.float64), settings)
    if fields is None:
        return Metrics(), []

    min_x = settings.min_x
    n_dec = len(fields["active"])
    frame_idx = np.arange(min_x - 1, min_x - 1 + n_dec)
    sample_off = {"start": 0, "center": opts.fft_size // 2,
                  "end": opts.fft_size}[opts.time_mode]
    # reference timestamp rounding: half away from zero to ms
    time_ms = np.floor(
        (frame_idx * opts.hop_size + sample_off) / sample_rate * 1000.0 + 0.5
    )
    times_s = time_ms / 1000.0
    speech = (
        fields["active"]
        & (fields["leading"] >= opts.min_leading_active_columns)
        & (fields["active_columns"] >= opts.min_active_columns)
        & (fields["confidence"] >= opts.min_confidence)
    )
    decisions = [
        TimedDecision(float(t), bool(s)) for t, s in zip(times_s, speech)
    ]

    frame_period_s = opts.hop_size / sample_rate
    decisions = postprocess_decisions(decisions, frame_period_s, opts)

    # vectorized label lookup: expected[i] = label_at(labels, time[i])
    times = np.asarray([d.time_s for d in decisions])
    predicted = np.asarray([d.speech for d in decisions])
    expected = _labels_mask(labels, times)
    metrics = Metrics()
    metrics.tp = int(np.sum(predicted & expected))
    metrics.fp = int(np.sum(predicted & ~expected))
    metrics.tn = int(np.sum(~predicted & ~expected))
    metrics.fn = int(np.sum(~predicted & expected))
    return metrics, decisions


@dataclasses.dataclass
class FileResult:
    path: Path
    duration_s: float
    wall_s: float
    metrics: Metrics


def evaluate_testset(
    testset: Path,
    opts: EvalOptions,
    settings: DetectionSettings,
    max_files: Optional[int] = None,
    on_decisions=None,
) -> Tuple[Metrics, List[FileResult]]:
    """Sequential per-file evaluation. ``on_decisions(wav, rate,
    decisions)``, when given, is called once per file with the
    post-processed decision array — diagnostics (e.g. segment printing)
    ride the same pass instead of re-running the pipeline."""
    wavs = sorted(testset.glob("*.wav"))
    if max_files is not None:
        wavs = wavs[:max_files]
    if not wavs:
        raise FileNotFoundError(f"no .wav files found in {testset}")

    total = Metrics()
    rows: List[FileResult] = []
    for wav in wavs:
        labels = read_labels(wav.with_suffix(".scv"))
        samples, rate = read_wav_mono(wav)
        started = time.perf_counter()
        metrics, decisions = evaluate_file(samples, rate, labels, opts,
                                           settings)
        wall = time.perf_counter() - started
        total.merge(metrics)
        rows.append(FileResult(wav, len(samples) / rate, wall, metrics))
        if on_decisions is not None:
            on_decisions(wav, rate, decisions)
    return total, rows


def evaluate_testset_batched(
    testset: Path,
    opts: EvalOptions,
    settings: DetectionSettings,
    max_files: Optional[int] = None,
    warmup: bool = False,
) -> Tuple[Metrics, List[FileResult]]:
    """Whole-testset evaluation as ONE batched device program.

    All clips are zero-padded to a common power-of-two length and the mel +
    raw VAD classification run as a single ``[files, ...]`` dispatch — the
    scale-out shape a TPU serving deployment uses (shard the file axis over
    a mesh for more chips). Decisions/metrics are identical to the
    sequential path; per-file wall time is attributed duration-weighted.
    """
    import jax
    import jax.numpy as jnp

    from melspec_tpu.ops.framing import num_frames_batch
    from melspec_tpu.ops.spectrogram import WhisperMelPipeline

    wavs = sorted(testset.glob("*.wav"))
    if max_files is not None:
        wavs = wavs[:max_files]
    if not wavs:
        raise FileNotFoundError(f"no .wav files found in {testset}")

    clips, rates, labels_all = [], [], []
    for wav in wavs:
        samples, rate = read_wav_mono(wav)
        clips.append(samples)
        rates.append(rate)
        labels_all.append(read_labels(wav.with_suffix(".scv")))
    if len(set(rates)) != 1:
        raise ValueError("batched evaluation requires a uniform sample rate")
    rate = rates[0]

    max_len = max(len(c) for c in clips)
    bucket = 1
    while bucket < max_len:
        bucket <<= 1
    batch = np.zeros((len(clips), bucket), dtype=np.float32)
    for i, c in enumerate(clips):
        batch[i, : len(c)] = c

    # bf3 on MXU backends: the eval pass is one dispatch and fetch-bound,
    # so the sig kernel's composed-program compile time (~2 min with the
    # Sobel stage fused behind it) buys nothing here
    impl = "bf3" if jax.default_backend() in ("tpu", "gpu") else "auto"
    pipe = WhisperMelPipeline(opts.fft_size, opts.hop_size, opts.n_mels,
                              float(rate), fft_impl=impl)

    from melspec_tpu.ops.vad import streaming_decision_fields_batched

    # Classification dtype: float64 when x64 is on (bit-parity with the
    # sequential host path), else float32 — the TPU default, where
    # astype(float64) would silently stay f32 anyway.  f32 decisions are
    # test-enforced equal to the f64 path on the JFK fixture
    # (tests/test_vad_batched_device.py::test_batched_fields_f32_parity_jfk);
    # the Sobel threshold comparison is far from f32 rounding at the
    # detector's operating points.
    classify_dtype = (
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    )

    @jax.jit
    def device_pass(x):
        # mel_batch (not the private jit) so the HBM frames-budget
        # chunking applies: a multi-hundred-clip testset must not
        # materialize the full [B, F, fft_pad] frame tensor in one piece
        mel = pipe.mel_batch(x)                   # [B, F, n_mels]
        img = jnp.swapaxes(mel, -1, -2)           # [B, n_mels, F]
        return streaming_decision_fields_batched(
            img.astype(classify_dtype), settings
        )

    if warmup:
        # a real host FETCH, not block_until_ready: through a remote
        # runtime the latter can return optimistically before the actual
        # compile, which would then land inside the timed region
        jax.device_get(device_pass(jnp.asarray(batch)))

    started = time.perf_counter()
    # ONE device_get for the whole dict: fetching values one at a time
    # pays a round trip each on remote runtimes, inflating the timed
    # region by several RTTs
    fields_all = jax.device_get(device_pass(jnp.asarray(batch)))
    wall_total = time.perf_counter() - started

    total = Metrics()
    rows: List[FileResult] = []
    durations = [len(c) / rate for c in clips]
    dur_sum = sum(durations)
    min_x = settings.min_x

    for i, wav in enumerate(wavs):
        t0 = time.perf_counter()
        n_frames = num_frames_batch(len(clips[i]), opts.fft_size,
                                    opts.hop_size)
        # decision fields were computed on-device for the padded width;
        # the first n_dec entries only read this file's real frames
        n_dec = n_frames - min_x + 1
        if n_dec <= 0:
            # clip shorter than the detector window: no decisions, like
            # the sequential path (streaming_decision_fields -> None); a
            # negative Python slice bound would otherwise keep garbage
            # padded-region entries
            rows.append(FileResult(wav, durations[i],
                                   time.perf_counter() - t0, Metrics()))
            continue
        speech = (
            fields_all["active"][i][:n_dec]
            & (fields_all["leading"][i][:n_dec]
               >= opts.min_leading_active_columns)
            & (fields_all["active_columns"][i][:n_dec]
               >= opts.min_active_columns)
            & (fields_all["confidence"][i][:n_dec] >= opts.min_confidence)
        )
        frame_idx = np.arange(min_x - 1, min_x - 1 + n_dec)
        sample_off = {"start": 0, "center": opts.fft_size // 2,
                      "end": opts.fft_size}[opts.time_mode]
        times_s = np.floor(
            (frame_idx * opts.hop_size + sample_off) / rate * 1000.0 + 0.5
        ) / 1000.0
        speech_pp = _postprocess_mask(np.asarray(speech, dtype=bool),
                                      times_s, opts.hop_size / rate, opts)
        expected = _labels_mask(labels_all[i], times_s)
        metrics = Metrics(
            tp=int(np.sum(speech_pp & expected)),
            fp=int(np.sum(speech_pp & ~expected)),
            tn=int(np.sum(~speech_pp & ~expected)),
            fn=int(np.sum(~speech_pp & expected)),
        )
        total.merge(metrics)
        host_wall = time.perf_counter() - t0
        attributed = wall_total * durations[i] / dur_sum + host_wall
        rows.append(FileResult(wav, durations[i], attributed, metrics))
    return total, rows


def macro_metrics(rows: Sequence[FileResult]) -> dict:
    n = len(rows)
    agg = {"precision": 0.0, "recall": 0.0, "f1": 0.0, "accuracy": 0.0,
           "fpr": 0.0, "fnr": 0.0}
    for row in rows:
        for key in agg:
            agg[key] += getattr(row.metrics, key)
    return {k: v / n for k, v in agg.items()}


def speed_metrics(rows: Sequence[FileResult]) -> dict:
    audio = sum(r.duration_s for r in rows)
    wall = sum(r.wall_s for r in rows)
    return {
        "audio_s": audio,
        "wall_s": wall,
        "rtf": wall / audio if audio else 0.0,
        "rtfx": audio / wall if wall else 0.0,
    }
