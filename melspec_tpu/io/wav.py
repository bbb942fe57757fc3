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
from typing import Optional, Tuple, Union

import numpy as np


def _find_chunk(wav_bytes: bytes, chunk_ids: Tuple[bytes, ...]) -> Tuple[int, int]:
    """Walk the RIFF chunk list; return (payload offset, size) of the first
    chunk whose id is in ``chunk_ids`` (one walker shared by the fmt and
    data lookups — they must stay byte-identical in their bookkeeping)."""
    if len(wav_bytes) < 12 or wav_bytes[:4] != b"RIFF" or wav_bytes[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    while pos + 8 <= len(wav_bytes):
        chunk_id = wav_bytes[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", wav_bytes, pos + 4)
        if chunk_id in chunk_ids:
            return pos + 8, chunk_size
        pos += 8 + chunk_size
        if chunk_size % 2:
            pos += 1  # chunks are word-aligned
    raise ValueError(f"no {chunk_ids[0].decode(errors='replace')!r} chunk found")


def _find_data_chunk(wav_bytes: bytes) -> Tuple[int, int]:
    return _find_chunk(wav_bytes, (b"data",))


def _read_fmt(wav_bytes: bytes) -> Tuple[int, int, int, int]:
    """Return (format_tag, channels, sample_rate, bits_per_sample)."""
    pos, chunk_size = _find_chunk(wav_bytes, (b"fmt ", b"fmt\x00"))
    tag, channels, rate = struct.unpack_from("<HHI", wav_bytes, pos)
    bits = struct.unpack_from("<H", wav_bytes, pos + 14)[0] \
        if chunk_size >= 16 else 0
    if tag == 0xFFFE and chunk_size >= 40:
        # WAVE_FORMAT_EXTENSIBLE: the real format tag is the first
        # two bytes of the SubFormat GUID
        (tag,) = struct.unpack_from("<H", wav_bytes, pos + 24)
    return tag, channels, rate, bits


def read_wav_f32le(path: Union[str, Path]) -> np.ndarray:
    """Read a mono float32-LE WAV; returns float32 samples. Rejects files
    whose fmt chunk declares anything else — silently frombuffer'ing
    int16 PCM bytes as f4 would yield denormal-scale garbage."""
    wav_bytes = Path(path).read_bytes()
    # no trust-caller fallback for a missing fmt chunk: a fmt-stripped
    # int16 file would silently misdecode as denormal-scale garbage, the
    # exact failure the fmt validation exists to catch (every vendored
    # fixture carries a fmt chunk)
    tag, _, _, bits = _read_fmt(wav_bytes)
    if tag != 3 or bits not in (0, 32):
        raise ValueError(
            f"{path}: not float32 PCM (format tag {tag}, {bits} bits) — "
            "use read_wav_mono for integer PCM"
        )
    offset, size = _find_data_chunk(wav_bytes)
    payload = wav_bytes[offset : offset + size]
    n = len(payload) // 4
    return np.frombuffer(payload[: n * 4], dtype="<f4").copy()


def read_wav(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Read a WAV (16-bit PCM or 32-bit float, any channel count) ->
    (f32 samples ``[n, channels]``, rate). Other widths raise instead of
    being silently misdecoded."""
    wav_bytes = Path(path).read_bytes()
    tag, channels, rate, bits = _read_fmt(wav_bytes)
    if channels < 1:
        raise ValueError(f"{path}: fmt declares {channels} channels")
    offset, size = _find_data_chunk(wav_bytes)
    payload = wav_bytes[offset : offset + size]
    if tag == 1:  # integer PCM
        if bits not in (0, 16):
            raise ValueError(
                f"{path}: {bits}-bit PCM unsupported (16-bit only)"
            )
        data = np.frombuffer(payload[: (len(payload) // 2) * 2], dtype="<i2")
        data = data.astype(np.float32) / 32768.0
    elif tag == 3:  # IEEE float
        if bits not in (0, 32):
            raise ValueError(
                f"{path}: {bits}-bit float unsupported (32-bit only)"
            )
        data = np.frombuffer(payload[: (len(payload) // 4) * 4],
                             dtype="<f4").copy()
    else:
        raise ValueError(f"unsupported WAV format tag {tag}")
    n = len(data) // channels
    return data[: n * channels].reshape(n, channels), rate


def read_wav_mono(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Read a mono WAV (16-bit PCM, or 32-bit float) -> (f32 samples, rate).
    Multi-channel files raise — downmix explicitly via :func:`load_audio`."""
    data, rate = read_wav(path)
    if data.shape[1] != 1:
        raise ValueError(f"{path} is not mono (channels={data.shape[1]})")
    return data[:, 0], rate


def load_audio(path: Union[str, Path],
               target_rate: Optional[int] = 16000) -> np.ndarray:
    """Read a mono WAV and resample it to ``target_rate`` — the
    librosa-``load``-shaped convenience for feeding a frontend whose
    config expects one rate (the reference leaves rate conversion to the
    embedder; melspec_tpu ships a scipy-parity polyphase resampler,
    ``ops/resample.py``). ``target_rate=None`` returns the file's native
    samples unresampled. The rate pair is validated (gcd-reduced, bounded
    matrix) before any resampler is built. Multi-channel files are
    downmixed to mono (channel mean) before resampling."""
    data, rate = read_wav(path)
    samples = data[:, 0] if data.shape[1] == 1 \
        else data.mean(axis=1, dtype=np.float64).astype(np.float32)
    if target_rate is None or int(rate) == int(target_rate):
        return samples
    from melspec_tpu.ops.resample import resample_poly, validate_ratio

    up, down = validate_ratio(int(target_rate), int(rate))
    return np.asarray(resample_poly(samples, up, down),
                      dtype=np.float32)


def iter_pcm_f32le(stream, chunk_bytes: int = 4096):
    """Yield float32 sample blocks from a raw f32le byte stream — the
    reference examples' stdin PCM transport (``examples/mel_tga/src/
    main.rs:24-40`` reads stdin in 4096-byte chunks). A trailing partial
    float is carried into the next block instead of truncated, so chunk
    boundaries never drop bytes; a final dangling 1-3 bytes at EOF are
    discarded (a malformed tail, exactly like the reference's
    ``chunks_exact``)."""
    carry = b""
    while True:
        buf = stream.read(chunk_bytes)
        if not buf:
            return
        buf = carry + buf
        n = len(buf) // 4 * 4
        carry = buf[n:]
        if n:
            yield np.frombuffer(buf[:n], dtype="<f4")
