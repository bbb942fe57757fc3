"""Minimal WAV readers for the fixture formats the reference uses.

- float32-LE mono (``testdata/jfk_f32le.wav``): RIFF chunk walk to the
  ``data`` chunk, mirroring the reference's in-test parser
  (``src/fbank.rs:324-352``).
- 16-bit PCM mono (TEN-VAD testset), scaled by 1/32768 like the reference's
  eval harness (``examples/vad_ten_eval/src/main.rs:287-303``).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Tuple, Union

import numpy as np


def _find_data_chunk(wav_bytes: bytes) -> Tuple[int, int]:
    """Return (offset, size) of the WAV ``data`` chunk payload."""
    if len(wav_bytes) < 12 or wav_bytes[:4] != b"RIFF" or wav_bytes[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    while pos + 8 <= len(wav_bytes):
        chunk_id = wav_bytes[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", wav_bytes, pos + 4)
        if chunk_id == b"data":
            return pos + 8, chunk_size
        pos += 8 + chunk_size
        if chunk_size % 2:
            pos += 1  # chunks are word-aligned
    raise ValueError("no 'data' chunk found")


def _read_fmt(wav_bytes: bytes) -> Tuple[int, int, int]:
    """Return (format_tag, channels, sample_rate) from the fmt chunk."""
    pos = 12
    while pos + 8 <= len(wav_bytes):
        chunk_id = wav_bytes[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", wav_bytes, pos + 4)
        if chunk_id in (b"fmt ", b"fmt\x00"):
            tag, channels, rate = struct.unpack_from("<HHI", wav_bytes, pos + 8)
            if tag == 0xFFFE and chunk_size >= 40:
                # WAVE_FORMAT_EXTENSIBLE: the real format tag is the first
                # two bytes of the SubFormat GUID
                (tag,) = struct.unpack_from("<H", wav_bytes, pos + 8 + 24)
            return tag, channels, rate
        pos += 8 + chunk_size
        if chunk_size % 2:
            pos += 1
    raise ValueError("no 'fmt ' chunk found")


def read_wav_f32le(path: Union[str, Path]) -> np.ndarray:
    """Read a mono float32-LE WAV; returns float32 samples."""
    wav_bytes = Path(path).read_bytes()
    offset, size = _find_data_chunk(wav_bytes)
    payload = wav_bytes[offset : offset + size]
    n = len(payload) // 4
    return np.frombuffer(payload[: n * 4], dtype="<f4").copy()


def read_wav_mono(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Read a mono WAV (16-bit PCM, or float32) -> (float32 samples, rate)."""
    wav_bytes = Path(path).read_bytes()
    tag, channels, rate = _read_fmt(wav_bytes)
    if channels != 1:
        raise ValueError(f"{path} is not mono (channels={channels})")
    offset, size = _find_data_chunk(wav_bytes)
    payload = wav_bytes[offset : offset + size]
    if tag == 1:  # PCM int16
        data = np.frombuffer(payload[: (len(payload) // 2) * 2], dtype="<i2")
        return (data.astype(np.float32) / 32768.0), rate
    if tag == 3:  # IEEE float
        data = np.frombuffer(payload[: (len(payload) // 4) * 4], dtype="<f4")
        return data.copy(), rate
    raise ValueError(f"unsupported WAV format tag {tag}")
