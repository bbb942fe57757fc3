"""Frame/millisecond conversions and formatting
(reference ``src/vad.rs:580-602``)."""

from __future__ import annotations

import math


def n_frames_for_duration(
    hop_size: int, sampling_rate: float, duration_ms: int
) -> int:
    """FFT frames needed to cover ``duration_ms`` (reference computes the
    frame duration in f32 then takes ``ceil`` — ``src/vad.rs:580-584``)."""
    import numpy as np

    frame_duration = np.float32(hop_size) / np.float32(sampling_rate) * np.float32(1000.0)
    return int(math.ceil(np.float32(duration_ms) / frame_duration))


def duration_ms_for_n_frames(
    hop_size: int, sampling_rate: float, total_frames: int
) -> int:
    """Milliseconds represented by ``total_frames`` (truncating, like the
    reference's ``as usize`` cast — ``src/vad.rs:587-590``)."""
    frame_duration = hop_size / sampling_rate * 1000.0
    return int(total_frames * frame_duration)


def format_milliseconds(milliseconds: int) -> str:
    """``HH:MM:SS.mmm`` (reference ``src/vad.rs:593-602``)."""
    total_seconds = milliseconds // 1000
    ms = milliseconds % 1000
    seconds = total_seconds % 60
    total_minutes = total_seconds // 60
    minutes = total_minutes % 60
    hours = total_minutes // 60
    return f"{hours:02d}:{minutes:02d}:{seconds:02d}.{ms:03d}"
