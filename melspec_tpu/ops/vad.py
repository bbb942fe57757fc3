"""Model-free Sobel-edge voice activity detection.

Same decision function as the reference (``src/vad.rs``), vectorized: the
reference walks every column with scalar 3x3 Sobel taps and early-exit
counting (``src/vad.rs:373-486``); here the squared Sobel gradient of the
whole mel image is eight shifted slices combined on the VPU, column
classification is one masked row-count, and the majority-vote smoothing
(``src/vad.rs:343-360``) is a prefix-sum. A batched streaming-equivalent
path (``streaming_decisions``) evaluates every per-frame decision of
``VoiceActivityDetector::add_activity`` (``src/vad.rs:156-205``) in one shot
— the TPU replacement for the reference's frame-at-a-time loop.

Geometry notes (bit-parity critical):
- gradients are evaluated with the 3x3 patch's TOP-LEFT corner at
  ``(y, x)``, ``y`` from ``start_y = min(min_mel, H-2)`` to ``H-3``;
- a window of ``W`` columns yields ``W-2`` classified columns;
- smoothing window is ±4 columns, majority = ``2*count >= window_len``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Set, Tuple, Union

import numpy as np
import jax.numpy as jnp

from melspec_tpu.config import DetectionSettings, VadFrameTiming, VoiceActivityTimestamps


@dataclasses.dataclass
class EdgeInfo:
    """Result of VAD boundary detection (reference ``src/vad.rs:488-524``).

    ``non_intersected_columns`` are good places to cut audio for ASR.
    """

    non_intersected_columns: List[int]
    intersected_columns: List[int]
    gradient_positions: Set[Tuple[int, int]]

    def non_intersected(self) -> List[int]:
        return list(self.non_intersected_columns)

    def intersected(self) -> List[int]:
        return list(self.intersected_columns)


def sobel_gradient_sq(img: jnp.ndarray) -> jnp.ndarray:
    """Squared Sobel gradient magnitude ``gx^2 + gy^2`` for every 3x3 patch.

    ``img`` is ``[..., H, W]``; returns ``[..., H-2, W-2]`` where entry
    ``(y, x)`` is the gradient of the patch whose top-left corner is
    ``(y, x)`` (the reference's indexing, ``src/vad.rs:472-486``).
    """
    tl = img[..., :-2, :-2]
    tc = img[..., :-2, 1:-1]
    tr = img[..., :-2, 2:]
    ml = img[..., 1:-1, :-2]
    mr = img[..., 1:-1, 2:]
    bl = img[..., 2:, :-2]
    bc = img[..., 2:, 1:-1]
    br = img[..., 2:, 2:]
    gx = (tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)
    gy = (bl + 2.0 * bc + br) - (tl + 2.0 * tc + tr)
    return gx * gx + gy * gy


def classify_columns(img: jnp.ndarray, settings: DetectionSettings) -> jnp.ndarray:
    """Raw per-column activity over a ``[H, W]`` mel image -> bool ``[W-2]``.

    A column is active when >= ``min_y`` of its vertical 3x3 gradients (rows
    ``start_y .. H-3``) have squared magnitude >= ``min_energy**2``
    (reference ``src/vad.rs:373-415``). ``min_y == 0`` marks everything
    active.
    """
    height = img.shape[-2]
    width = img.shape[-1]
    if settings.min_y == 0:
        return jnp.ones(img.shape[:-2] + (width - 2,), dtype=bool)
    g2 = sobel_gradient_sq(img)  # [..., H-2, W-2]
    start_y = min(settings.min_mel, height - 2)
    g2 = g2[..., start_y:, :]
    thr = settings.min_energy * settings.min_energy
    counts = jnp.sum(g2 >= thr, axis=-2)
    return counts >= settings.min_y


def smooth_mask(mask: jnp.ndarray, window: int = 4) -> jnp.ndarray:
    """Moving-window majority vote over a boolean mask: index ``i`` is true
    when at least half of ``mask[max(0,i-window) : min(i+window+1, n)]`` is
    true (reference ``src/vad.rs:343-360``)."""
    n = mask.shape[-1]
    ints = mask.astype(jnp.int32)
    prefix = jnp.concatenate(
        [jnp.zeros(mask.shape[:-1] + (1,), jnp.int32), jnp.cumsum(ints, axis=-1)],
        axis=-1,
    )
    i = jnp.arange(n)
    start = jnp.maximum(i - window, 0)
    end = jnp.minimum(i + window + 1, n)
    count = jnp.take(prefix, end, axis=-1) - jnp.take(prefix, start, axis=-1)
    return count * 2 >= (end - start)


def vad_boundaries(
    frames: Union[np.ndarray, Sequence[np.ndarray]],
    settings: DetectionSettings,
) -> EdgeInfo:
    """Classify all columns of a mel image (or list of frames, logically
    concatenated on the time axis) into intersected / non-intersected
    (reference ``src/vad.rs:251-338``)."""
    if isinstance(frames, (list, tuple)):
        if len(frames) == 0:
            return EdgeInfo([], [], set())
        img = np.concatenate([np.asarray(f, np.float64) for f in frames], axis=1)
    else:
        img = np.asarray(frames, dtype=np.float64)

    height, width = img.shape
    if height < 3 or width < 3:
        return EdgeInfo([], [], set())

    raw = classify_columns(jnp.asarray(img), settings)
    smoothed = np.asarray(smooth_mask(raw, 4))
    intersected = [int(x) for x in np.nonzero(smoothed)[0]]
    non_intersected = [int(x) for x in np.nonzero(~smoothed)[0]]
    # gradient_positions stays empty — exact parity with the reference,
    # which also ships it empty ("We leave gradient_positions empty in
    # this version", src/vad.rs:330-331); as_image renders the overlay
    # when a caller fills it manually, like the reference's API allows.
    return EdgeInfo(non_intersected, intersected, set())


def vad_on(edge_info: EdgeInfo, n: int) -> bool:
    """True when ``n`` contiguous intersected columns exist
    (reference ``src/vad.rs:224-249``)."""
    cols = edge_info.intersected_columns
    if not cols:
        return False
    contiguous = 1
    if contiguous >= n:  # the first column is itself a run of one
        return True
    prev = cols[0]
    for idx in cols[1:]:
        contiguous = contiguous + 1 if idx == prev + 1 else 1
        if contiguous >= n:
            return True
        prev = idx
    return False


def leading_active_columns(intersected: Sequence[int]) -> int:
    """Length of the consecutive run 0,1,2,... present in ``intersected``
    (reference ``src/vad.rs:212-222``)."""
    expected = 0
    for column in intersected:
        if column == expected:
            expected += 1
        elif column > expected:
            break
    return expected


@dataclasses.dataclass(frozen=True)
class VoiceActivity:
    """Streaming VAD decision (reference ``src/vad.rs:126-135``)."""

    active: bool
    frame_index: int
    leading_active_columns: int
    active_columns: int
    window_columns: int
    confidence: float
    timestamps: Optional[VoiceActivityTimestamps] = None


def streaming_decision_fields(
    mel: np.ndarray, settings: DetectionSettings
) -> Optional[dict]:
    """Vectorized core of ``streaming_decisions``: all per-frame decision
    fields as numpy arrays (decision ``i`` is for frame ``min_x - 1 + i``).
    Returns None when the clip never reaches ``min_x`` frames."""
    mel = np.asarray(mel, dtype=np.float64)
    height, total = mel.shape
    min_x = settings.min_x
    if total < min_x:
        return None
    win_cols = min_x - 2
    if height < 3 or win_cols < 1:
        n_dec = total - min_x + 1
        zeros = np.zeros(n_dec)
        return {
            "active": zeros.astype(bool),
            "leading": zeros.astype(int),
            "active_columns": zeros.astype(int),
            "window_columns": zeros.astype(int),
            "confidence": zeros,
        }

    # pad the time axis to a power of two so jit caches hit across ragged
    # clip lengths (zero columns only influence raw entries >= total-2,
    # which are sliced away)
    t_pad = 1
    while t_pad < total:
        t_pad <<= 1
    mel_p = np.pad(mel, ((0, 0), (0, t_pad - total)))
    raw = np.asarray(classify_columns(jnp.asarray(mel_p), settings))[: total - 2]

    n_dec = total - min_x + 1
    idx = np.arange(n_dec)[:, None] + np.arange(win_cols)[None, :]
    windows = raw[idx]  # [n_dec, win_cols] bool

    d_pad = 1
    while d_pad < n_dec:
        d_pad <<= 1
    windows_p = np.pad(windows, ((0, d_pad - n_dec), (0, 0)))
    smoothed = np.asarray(smooth_mask(jnp.asarray(windows_p), 4))[:n_dec]

    active_columns = smoothed.sum(axis=1)
    leading = np.where(smoothed, 1, 0).cumprod(axis=1).sum(axis=1)
    return {
        "active": smoothed[:, 0].copy(),
        "leading": leading,
        "active_columns": active_columns,
        "window_columns": np.full(n_dec, win_cols),
        "confidence": active_columns / win_cols,
    }


def streaming_decision_fields_batched(
    mels: Optional[jnp.ndarray], settings: DetectionSettings,
    raw: Optional[jnp.ndarray] = None,
) -> dict:
    """Fully on-device, jittable batched decision fields.

    ``mels`` is ``[B, n_mels, T]``; returns a dict of ``[B, n_dec]`` arrays
    (``n_dec = T - min_x + 1``) with the same semantics as
    ``streaming_decision_fields`` — the serving-shaped form: jit it, shard
    the batch axis, or embed it in a larger step. Requires
    ``T >= min_x`` and ``min_x >= 3``.

    Pass ``raw`` (``[B, T-2]`` bool, e.g. from the fused kernel's Sobel
    epilogue ``mel_kernel.whisper_mel_vad_sig``) to skip the
    ``classify_columns`` pass; ``mels`` may then be None.
    """
    if raw is not None:
        height, total = 3, raw.shape[-1] + 2  # height only gates the guard
    else:
        height, total = mels.shape[-2], mels.shape[-1]
    min_x = settings.min_x
    win_cols = min_x - 2
    if total < min_x or height < 3 or win_cols < 1:
        raise ValueError("need T >= min_x >= 3 and n_mels >= 3")

    if raw is None:
        raw = classify_columns(mels, settings)  # [B, T-2]
    n_dec = total - min_x + 1
    windows = jnp.stack(
        [raw[..., j : j + n_dec] for j in range(win_cols)], axis=-1
    )  # [B, n_dec, win_cols]
    smoothed = smooth_mask(windows, 4)

    active_columns = jnp.sum(smoothed, axis=-1)
    leading = jnp.sum(
        jnp.cumprod(smoothed.astype(jnp.int32), axis=-1), axis=-1
    )
    return {
        "active": smoothed[..., 0],
        "leading": leading,
        "active_columns": active_columns,
        "window_columns": jnp.full(active_columns.shape, win_cols),
        "confidence": active_columns / win_cols,
    }


def streaming_decisions(
    mel: np.ndarray,
    settings: DetectionSettings,
    timing: Optional[VadFrameTiming] = None,
) -> List[Optional[VoiceActivity]]:
    """Evaluate every per-frame decision of the streaming detector over a
    full ``[n_mels, T]`` mel image in one vectorized pass.

    Bit-equivalent to feeding frames one by one into
    ``VoiceActivityDetector`` (the reference loop, ``src/vad.rs:156-205``):
    the detector's window at frame ``t`` is the last ``min_x`` columns, whose
    raw Sobel classification equals the global classification restricted to
    columns ``t-min_x+1 .. t-2`` (the gradient is local), while the majority
    smoothing must be re-run inside each window because it clips at window
    edges. Entry ``t`` is ``None`` while fewer than ``min_x`` frames are
    buffered.
    """
    mel = np.asarray(mel, dtype=np.float64)
    total = mel.shape[1]
    min_x = settings.min_x
    results: List[Optional[VoiceActivity]] = [None] * min(total, min_x - 1)
    fields = streaming_decision_fields(mel, settings)
    if fields is None:
        return results

    n_dec = len(fields["active"])
    for i in range(n_dec):
        t = min_x - 1 + i
        results.append(
            VoiceActivity(
                active=bool(fields["active"][i]),
                frame_index=t,
                leading_active_columns=int(fields["leading"][i]),
                active_columns=int(fields["active_columns"][i]),
                window_columns=int(fields["window_columns"][i]),
                confidence=float(fields["confidence"][i]),
                timestamps=timing.timestamps_for_frame(t) if timing else None,
            )
        )
    return results


def as_image(
    frames: Union[np.ndarray, Sequence[np.ndarray]],
    non_intersected_columns: Sequence[int],
    gradient_positions: Set[Tuple[int, int]],
) -> np.ndarray:
    """Debug RGB render of a mel image with boundary columns tinted green
    and gradient positions red (reference ``src/vad.rs:528-577``); returns
    ``[H, W, 3] uint8`` with mel row 0 at the bottom."""
    if isinstance(frames, (list, tuple)):
        img = np.concatenate([np.asarray(f, np.float64) for f in frames], axis=1)
    else:
        img = np.asarray(frames, dtype=np.float64)
    height, width = img.shape
    max_val = max(img.max(), 0.0)
    if max_val > 0:
        # saturating cast (Rust `as u8` semantics): negatives -> 0
        scaled = np.clip(img * (255.0 / max_val), 0.0, 255.0).astype(np.uint8)
    else:
        scaled = np.zeros_like(img, np.uint8)
    scaled = scaled[::-1]  # row 0 at the bottom

    rgb = np.stack([scaled] * 3, axis=-1).astype(np.int32)
    non_set = set(non_intersected_columns)
    for x in non_set:
        if 0 <= x < width:
            rgb[:10, x] = [0, 255, 0]
            rgb[10:, x, 1] = np.minimum(rgb[10:, x, 1] + 60, 255)
    for (x, inv_y) in gradient_positions:
        y = height - inv_y - 3
        if 0 <= y < height and 0 <= x < width:
            rgb[y, x, 0] = min(int(rgb[y, x, 0]) + 200, 255)
    return rgb.astype(np.uint8)


def save_image(path, rgb: np.ndarray) -> None:
    """Write a debug image as PNG."""
    from PIL import Image

    Image.fromarray(rgb, mode="RGB").save(str(path))
