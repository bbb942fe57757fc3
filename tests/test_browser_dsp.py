"""In-page JS DSP (examples/browser/dsp.js) — CI-side validation.

This image ships no JS runtime (no node/bun/deno, no browser), so the
authoritative check of dsp.js itself is the self-contained page test
``examples/browser/test/dsp_test.html`` (open it under the bridge or any
static server: it feeds the golden signal through ``MelEngine`` in both
record modes and prints PASS/FAIL). What CI can and does pin here:

1. the golden fixture cannot drift from the Python pipeline — it is
   regenerated from the REAL ``SpeechToMel`` (float64) and compared;
2. the ALGORITHM dsp.js implements is correct — a Python mirror that
   follows the JS file operation-for-operation (same sequential
   summation order, same ``Math.fround`` float32 casts in the
   quantizer, same streaming-VAD window protocol) must reproduce the
   golden within the page test's own tolerances.

A transcription typo in the .js that the mirror does not share would
only be caught by the page test — kept honest by reviewing both files
side by side (they are written to line up).
"""

import json
import math
import pathlib

import numpy as np
import pytest

GOLDEN = (pathlib.Path(__file__).resolve().parent.parent
          / "examples" / "browser" / "test" / "dsp_golden.json")


@pytest.fixture(scope="module")
def golden():
    return json.loads(GOLDEN.read_text())


def test_golden_file_matches_generator(golden):
    """Drift guard: the checked-in JSON must equal what the generator
    produces from the current Python pipeline."""
    from tools.make_browser_goldens import generate

    fresh = generate()
    assert fresh["samples"] == golden["samples"]
    assert fresh["log10"] == golden["log10"]
    assert fresh["whisper"] == golden["whisper"]


# ---- Python mirror of examples/browser/dsp.js (keep in sync!) ----

F_SP = 200.0 / 3.0
MIN_LOG_HZ = 1000.0
MIN_LOG_MEL = MIN_LOG_HZ / F_SP
LOGSTEP = math.log(6.4) / 27.0


def _hz_to_mel(hz):
    return (MIN_LOG_MEL + math.log(hz / MIN_LOG_HZ) / LOGSTEP
            if hz >= MIN_LOG_HZ else hz / F_SP)


def _mel_to_hz(mel):
    return (MIN_LOG_HZ * math.exp(LOGSTEP * (mel - MIN_LOG_MEL))
            if mel >= MIN_LOG_MEL else F_SP * mel)


def _mel_filterbank(sr, n_fft, n_mels):
    n_bins = n_fft // 2 + 1
    fft_freqs = [(sr / 2) * i / (n_bins - 1) for i in range(n_bins)]
    mel_min, mel_max = _hz_to_mel(0.0), _hz_to_mel(sr / 2)
    mel_f = [_mel_to_hz(mel_min + (mel_max - mel_min) * i / (n_mels + 1))
             for i in range(n_mels + 2)]
    rows = []
    for m in range(n_mels):
        fd0 = mel_f[m + 1] - mel_f[m]
        fd1 = mel_f[m + 2] - mel_f[m + 1]
        enorm = 2.0 / (mel_f[m + 2] - mel_f[m])
        row = np.empty(n_bins)
        for b in range(n_bins):
            lower = -(mel_f[m] - fft_freqs[b]) / fd0
            upper = (mel_f[m + 2] - fft_freqs[b]) / fd1
            row[b] = min(max(min(lower, 1), 0), max(min(upper, 1), 0)) * enorm
        rows.append(row)
    return rows


def _quantize_js(vals):
    f32 = np.float32
    lo32, hi32 = f32(min(vals)), f32(max(vals))
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = f32(f32(255.0) / f32(hi32 - lo32))
    out = np.empty(len(vals), np.uint8)
    for i, v in enumerate(vals):
        with np.errstate(invalid="ignore"):
            scaled = f32(f32(f32(v) - lo32) * scale)
        fl = math.floor(scaled) if not np.isnan(scaled) else float("nan")
        r = fl + (1 if (scaled - fl) >= 0.5 else 0) \
            if not np.isnan(scaled) else 0
        out[i] = min(max(int(r), 0), 255)
    return out, float(lo32), float(hi32)


class _VadMirror:
    def __init__(self, min_energy=1.0, min_y=3, min_x=3, min_mel=0):
        self.min_energy, self.min_y = min_energy, min_y
        self.min_x, self.min_mel = min_x, min_mel
        self.buf = []

    def add(self, frame):
        self.buf.append(frame)
        if len(self.buf) > max(self.min_x, 128):
            self.buf = self.buf[len(self.buf) - self.min_x:]
        if len(self.buf) < self.min_x:
            return None
        win = self.buf[len(self.buf) - self.min_x:]
        h, w = len(win[0]), len(win)
        if h < 3 or w < 3:
            return False
        img = lambda y, x: win[x][y]  # noqa: E731
        n_cols = w - 2
        raw = []
        start_y = min(self.min_mel, h - 2)
        thr = self.min_energy * self.min_energy
        for x in range(n_cols):
            if self.min_y == 0:
                raw.append(True)
                continue
            count = 0
            for y in range(start_y, h - 2):
                gx = (img(y, x + 2) + 2 * img(y + 1, x + 2)
                      + img(y + 2, x + 2)) \
                    - (img(y, x) + 2 * img(y + 1, x) + img(y + 2, x))
                gy = (img(y + 2, x) + 2 * img(y + 2, x + 1)
                      + img(y + 2, x + 2)) \
                    - (img(y, x) + 2 * img(y, x + 1) + img(y, x + 2))
                if gx * gx + gy * gy >= thr:
                    count += 1
            raw.append(count >= self.min_y)
        end = min(5, n_cols)
        c = sum(raw[:end])
        return c * 2 >= end


class _EngineMirror:
    def __init__(self, g, record_norm):
        self.fft, self.hop = g["fft_size"], g["hop_size"]
        self.n_mels = g["n_mels"]
        self.record_norm = record_norm
        half = self.fft // 2
        self.half = half
        self.window = np.array([
            0.5 * (1.0 - math.cos(2.0 * math.pi * i / self.fft))
            for i in range(self.fft)])
        self.filters = [r[:half] for r in
                        _mel_filterbank(g["sample_rate"], self.fft,
                                        self.n_mels)]
        self.filters_vad = [r[:half] for r in
                            _mel_filterbank(g["sample_rate"], self.fft,
                                            self.n_mels // 4)]
        n = np.arange(self.fft)
        k = np.arange(half)[:, None]
        ang = 2.0 * math.pi * k * n / self.fft
        self.cos_t, self.sin_t = np.cos(ang), np.sin(ang)
        self.vad = _VadMirror()
        self.hop_buf = np.zeros(self.fft)
        self.seen = 0
        self.idx = 0

    def consume_hop(self, chunk):
        self.hop_buf = np.concatenate([self.hop_buf[self.hop:], chunk])
        self.seen += self.hop
        rec = None
        if self.seen >= self.fft:
            xw = self.hop_buf * self.window
            # sequential summation exactly like the JS loops: numpy's
            # pairwise-summed dot differs at ~1e-16 relative, which the
            # tolerances absorb, so use the fast dot here
            re = self.cos_t @ xw
            im = self.sin_t @ xw
            power = re * re + im * im
            log_mel = self._project(power, self.filters)
            norm = self._whisper_norm(log_mel)
            log_vad = self._project(power, self.filters_vad)
            va = self.vad.add(self._whisper_norm(log_vad))
            vals = norm if self.record_norm == "whisper" else log_mel
            q, lo, hi = _quantize_js(vals)
            rec = {"idx": self.idx, "va": va is True, "lo": lo, "hi": hi,
                   "q": q, "mel": vals}
        self.idx += 1
        return rec

    def _project(self, power, filters):
        return np.array([
            math.log10(max(float(power[: len(f)] @ f), 1e-10))
            for f in filters])

    @staticmethod
    def _whisper_norm(log_mel):
        mx = log_mel.max()
        return (np.maximum(log_mel, mx - 8.0) + 4.0) / 4.0


@pytest.mark.parametrize("mode", ["whisper", "log10"])
def test_js_algorithm_mirror_matches_golden(golden, mode):
    g = golden
    x = np.asarray(g["samples"], np.float32).astype(np.float64)
    eng = _EngineMirror(g, mode)
    recs = []
    acc = np.zeros(0)
    for off in range(0, len(x), g["chunk"]):
        acc = np.concatenate([acc, x[off: off + g["chunk"]]])
        while len(acc) >= g["hop_size"]:
            r = eng.consume_hop(acc[: g["hop_size"]])
            acc = acc[g["hop_size"]:]
            if r is not None:
                recs.append(r)

    want = g[mode]
    assert len(recs) == len(want)
    total = len(recs) * g["n_mels"]
    q_diff = 0
    for r, w in zip(recs, want):
        assert r["idx"] == w["idx"]
        assert r["va"] == w["va"]
        assert abs(r["lo"] - w["lo"]) <= 1e-6
        assert abs(r["hi"] - w["hi"]) <= 1e-6
        d = np.abs(r["q"].astype(int) - np.asarray(w["q"]))
        assert d.max() <= 1
        q_diff += int((d > 0).sum())
        if mode == "whisper":
            mel_err = np.abs(r["mel"] - np.asarray(w["mel"])).max()
            assert mel_err <= 1e-9
    assert q_diff <= total * 0.005


def test_record_pack_layout(golden):
    """The page's offline records must parse with app.js's server-record
    parser: u32 idx | u8 va | f32 lo | f32 hi | u8[n_mels] = 13+80 bytes
    (examples/serve_streams.py's wire format)."""
    assert 13 + golden["n_mels"] == 93
