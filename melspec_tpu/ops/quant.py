"""8-bit min-max quantization for mel interchange.

Numerically identical to the reference (``src/quant.rs:140-165``): per-array
min/max range, ``scale = 255/(max-min)``, round-half-away-from-zero, clamp to
[0, 255]; degenerate ranges (max == min) quantize to 0 exactly like Rust's
``NaN.max(0.0).min(255.0)`` chain. Provided both as numpy (host, bit-exact)
and jnp (device, fusable with the mel pipeline) implementations.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuantizationRange:
    min: float
    max: float


def quantize(frame: np.ndarray) -> Tuple[np.ndarray, QuantizationRange]:
    """Quantize float32 values to u8 with their min/max range (host path)."""
    frame = np.asarray(frame, dtype=np.float32)
    lo = float(frame.min()) if frame.size else float("inf")
    hi = float(frame.max()) if frame.size else float("-inf")
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.float32(255.0) / (np.float32(hi) - np.float32(lo))
        scaled = (frame - np.float32(lo)) * scale
        # round half away from zero EXACTLY like the reference's f32
        # .round(): floor(x) + (frac >= 0.5), where x - floor(x) is exact
        # in f32. The naive floor(x + 0.5) differs one ulp below a half
        # (the f32 ADD rounds x+0.5 up to the next integer first). Clamp
        # like .round().max(0.0).min(255.0); NaN (degenerate range,
        # max == min) -> 0
        fl = np.floor(scaled)
        rounded = fl + (scaled - fl >= np.float32(0.5)).astype(np.float32)
    rounded = np.where(np.isnan(rounded), np.float32(0.0), rounded)
    out = np.clip(rounded, 0.0, 255.0).astype(np.uint8)
    return out, QuantizationRange(min=lo, max=hi)


def dequantize(data: np.ndarray, rng: QuantizationRange) -> np.ndarray:
    """u8 -> float32 using the stored range (host path)."""
    scale = (np.float32(rng.max) - np.float32(rng.min)) / np.float32(255.0)
    return np.asarray(data, dtype=np.float32) * scale + np.float32(rng.min)


def quantize_jnp(frame: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device quantization over the WHOLE array: ``(u8 values, min, max)``.
    Fuses with the mel pipeline so only 1 byte/value crosses HBM/host
    boundaries — the TPU-native analogue of the reference's WASM worker
    packing quantized bytes into its output ring (``src/wasm.rs:95-145``).
    The flattened special case of ``quantize_frames_jnp`` (one rounding
    pipeline keeps the Rust-``round()`` bit-exactness in one place)."""
    q, lo, hi = quantize_frames_jnp(frame.reshape(-1))
    return q.reshape(frame.shape), lo, hi


def dequantize_jnp(data: jnp.ndarray, lo, hi) -> jnp.ndarray:
    scale = (hi - lo) / 255.0
    return data.astype(jnp.float32) * scale + lo


def quantize_frames_jnp(
    frames: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-FRAME device quantization: each trailing-axis vector gets its
    own min/max range — the wire-record form (``src/wasm.rs:95-145``
    quantizes every emitted mel column independently; the serving loop
    ships ``min | max | u8[n_mels]`` per frame). ``frames [..., n]`` ->
    ``(u8 [..., n], lo [...], hi [...])``, bit-exact with calling
    ``quantize`` on every frame (same f32 expression tree; min/max are
    order-independent)."""
    frames = frames.astype(jnp.float32)
    lo = jnp.min(frames, axis=-1)
    hi = jnp.max(frames, axis=-1)
    scale = 255.0 / (hi - lo)
    scaled = (frames - lo[..., None]) * scale[..., None]
    fl = jnp.floor(scaled)
    rounded = fl + (scaled - fl >= 0.5).astype(jnp.float32)
    rounded = jnp.where(jnp.isnan(rounded), 0.0, rounded)
    return jnp.clip(rounded, 0.0, 255.0).astype(jnp.uint8), lo, hi
