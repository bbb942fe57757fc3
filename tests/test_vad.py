"""VAD: differential test vs a naive convolutional reimplementation, the
reference's TGA fixture on/off assertions (``src/vad.rs:621-670``), streaming
protocol parity, and the batched streaming-equivalent path."""

import numpy as np
import pytest

from melspec_tpu.config import DetectionSettings, VadFrameTiming
from melspec_tpu.io.tga import load_tga_8bit, to_array2
from melspec_tpu.ops.vad import (
    as_image,
    leading_active_columns,
    smooth_mask,
    streaming_decisions,
    vad_boundaries,
    vad_on,
)
from melspec_tpu.streaming.vad import VoiceActivityDetector
from melspec_tpu.utils.timing import (
    duration_ms_for_n_frames,
    format_milliseconds,
    n_frames_for_duration,
)

import jax.numpy as jnp

BLANK_IDS = [21168, 23760, 41492, 41902, 63655, 7497, 39744]
SPEECH_IDS = [11648, 2889, 4694, 4901, 27125]


def naive_vad_boundaries(img: np.ndarray, settings: DetectionSettings):
    """Independent scalar-loop implementation of the published semantics:
    full 3x3 Sobel at every interior pixel, per-column row count with the
    min_mel row skip, +/-4 majority smoothing."""
    height, width = img.shape
    if height < 3 or width < 3:
        return [], []
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float64)
    ky = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float64)
    thr = settings.min_energy ** 2
    start_y = min(settings.min_mel, height - 2)
    raw = []
    for x in range(width - 2):
        count = 0
        active = settings.min_y == 0
        for y in range(start_y, height - 2):
            patch = img[y : y + 3, x : x + 3]
            gx = float((patch * kx).sum())
            gy = float((patch * ky).sum())
            if gx * gx + gy * gy >= thr:
                count += 1
                if count >= settings.min_y:
                    active = True
                    break
        raw.append(active)
    n = len(raw)
    smoothed = []
    for i in range(n):
        start = max(0, i - 4)
        end = min(i + 5, n)
        smoothed.append(sum(raw[start:end]) * 2 >= end - start)
    inter = [i for i, v in enumerate(smoothed) if v]
    non = [i for i, v in enumerate(smoothed) if not v]
    return non, inter


@pytest.mark.parametrize(
    "settings,fixture",
    [
        (DetectionSettings(1.0, 3, 6, 0), "quantized_mel_golden.tga"),
        (DetectionSettings(1.0, 10, 10, 0), "blank/frame_23760.tga"),
        (DetectionSettings(1.0, 10, 10, 0), "speech/frame_27125.tga"),
        (DetectionSettings(1.0, 6, 1, 0), "jfk_full_speech_chunk1_golden.tga"),
        (DetectionSettings(0.98, 11, 5, 2), "quantized_mel_golden.tga"),
    ],
)
def test_vad_boundaries_matches_naive(testdata, settings, fixture):
    img = to_array2(load_tga_8bit(testdata / fixture), 80)
    got = vad_boundaries(img, settings)
    non, inter = naive_vad_boundaries(img, settings)
    assert got.intersected() == inter, fixture
    assert got.non_intersected() == non, fixture
    assert got.gradient_positions == set()


def test_fixture_speech_detection(testdata):
    """The reference's on/off fixture assertions (``src/vad.rs:621-670``)."""
    settings = DetectionSettings(min_energy=1.0, min_y=10, min_x=10, min_mel=0)
    for fid in BLANK_IDS:
        img = to_array2(load_tga_8bit(testdata / f"blank/frame_{fid}.tga"), 80)
        edge = vad_boundaries(img, settings)
        assert vad_on(edge, 10) is False, f"blank {fid} misdetected"
    for fid in SPEECH_IDS:
        img = to_array2(load_tga_8bit(testdata / f"speech/frame_{fid}.tga"), 80)
        edge = vad_boundaries(img, settings)
        assert vad_on(edge, 10) is True, f"speech {fid} missed"


def test_streaming_protocol(testdata):
    """Frame-by-frame detector: decisions start at frame min_x-1; matches
    whole-window reclassification (reference ``tests/vad_regression.rs``)."""
    settings = DetectionSettings(min_energy=1.0, min_y=3, min_x=3, min_mel=0)
    img = to_array2(load_tga_8bit(testdata / "quantized_mel_golden.tga"), 80)
    vad = VoiceActivityDetector(settings)
    outputs = [vad.add(img[:, t : t + 1]) for t in range(img.shape[1])]
    assert outputs[0] is None and outputs[1] is None
    assert all(o is not None for o in outputs[2:])

    # independent check: decision at t must equal boundary classification
    # of the last min_x columns
    for t in range(2, img.shape[1]):
        window = img[:, t - 2 : t + 1]
        _, inter = naive_vad_boundaries(window, settings)
        want = bool(inter) and inter[0] == 0
        assert outputs[t] == want, f"frame {t}"


def test_streaming_decisions_batched_equals_loop(testdata):
    settings = DetectionSettings(min_energy=1.0, min_y=3, min_x=5, min_mel=0)
    timing = VadFrameTiming(400, 160, 16000.0)
    img = to_array2(load_tga_8bit(testdata / "quantized_mel_golden.tga"), 80)
    img = img[:, :400]

    batched = streaming_decisions(img, settings, timing)
    vad = VoiceActivityDetector(settings, timing)
    for t in range(img.shape[1]):
        got = vad.add_activity(img[:, t : t + 1])
        want = batched[t]
        if want is None:
            assert got is None
            continue
        assert got == want, f"frame {t}: {got} != {want}"


def test_streaming_timestamps(testdata):
    """Timestamp contract (reference ``tests/vad_regression.rs:233-266``)."""
    settings = DetectionSettings(min_energy=1.0, min_y=3, min_x=3, min_mel=0)
    timing = VadFrameTiming(400, 160, 16000.0)
    img = to_array2(load_tga_8bit(testdata / "quantized_mel_golden.tga"), 80)
    vad = VoiceActivityDetector(settings, timing)
    first = None
    for t in range(img.shape[1]):
        first = vad.add_activity(img[:, t : t + 1])
        if first is not None:
            break
    assert first.frame_index == 2
    assert first.timestamps.start_ms == 20
    assert first.timestamps.center_ms == 33
    assert first.timestamps.end_ms == 45


def test_readme_vad_timestamp_contract():
    """README contract: zero frames, default settings -> emission with
    timestamps once min_x frames are buffered
    (``tests/readme_examples.rs:72-86``)."""
    settings = DetectionSettings()
    vad = VoiceActivityDetector(settings, VadFrameTiming(400, 160, 16000.0))
    frame = np.zeros((80, 1))
    for _ in range(settings.min_x):
        vad.add_activity(frame)
    activity = vad.add_activity(frame)
    assert activity is not None and activity.timestamps is not None


def test_smooth_mask_matches_scalar():
    rng = np.random.default_rng(0)
    mask = rng.random(50) > 0.6
    got = np.asarray(smooth_mask(jnp.asarray(mask), 4))
    for i in range(50):
        start, end = max(0, i - 4), min(i + 5, 50)
        assert got[i] == (mask[start:end].sum() * 2 >= end - start)


def test_vad_on_contiguity():
    from melspec_tpu.ops.vad import EdgeInfo

    assert vad_on(EdgeInfo([], [1, 2, 3], set()), 3) is True
    assert vad_on(EdgeInfo([], [1, 3, 5], set()), 2) is False
    assert vad_on(EdgeInfo([], [], set()), 1) is False


def test_leading_active_columns():
    assert leading_active_columns([0, 1, 2, 5]) == 3
    assert leading_active_columns([1, 2]) == 0
    assert leading_active_columns([]) == 0


def test_buffer_overflow_keeps_decisions_stable():
    """Decisions must be identical long past the 128-frame drain point."""
    settings = DetectionSettings(min_energy=1.0, min_y=2, min_x=4, min_mel=0)
    rng = np.random.default_rng(4)
    img = rng.random((20, 300)) * 3.0
    vad = VoiceActivityDetector(settings)
    loop = [vad.add(img[:, t : t + 1]) for t in range(300)]
    batched = streaming_decisions(img, settings)
    batched_bool = [None if b is None else b.active for b in batched]
    assert loop == batched_bool


def test_as_image_overlay(testdata, tmp_path):
    img = to_array2(load_tga_8bit(testdata / "speech/frame_27125.tga"), 80)
    edge = vad_boundaries(img, DetectionSettings(1.0, 10, 10, 0))
    rgb = as_image(img, edge.non_intersected(), set())
    assert rgb.shape == (80, img.shape[1], 3) and rgb.dtype == np.uint8
    from melspec_tpu.ops.vad import save_image

    save_image(tmp_path / "vad.png", rgb)
    assert (tmp_path / "vad.png").stat().st_size > 0


def test_timing_helpers():
    assert format_milliseconds(3_725_042) == "01:02:05.042"
    assert n_frames_for_duration(160, 16000.0, 1000) == 100
    assert duration_ms_for_n_frames(160, 16000.0, 100) == 1000


def test_vad_on_single_column_runs():
    """n=1 must be an 'any activity' test: one intersected column is a run
    of one (the old loop only tested runs after a reset, so a single
    column returned False while two NON-adjacent ones returned True)."""
    from melspec_tpu.ops.vad import EdgeInfo, vad_on

    assert vad_on(EdgeInfo([], [5], set()), 1)
    assert vad_on(EdgeInfo([], [5, 9], set()), 1)
    assert not vad_on(EdgeInfo([], [5, 9], set()), 2)   # non-adjacent
    assert vad_on(EdgeInfo([], [5, 6], set()), 2)
    assert not vad_on(EdgeInfo([], [], set()), 1)
