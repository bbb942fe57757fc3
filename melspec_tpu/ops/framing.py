"""Frame extraction for batched STFT pipelines.

TPU-first framing: instead of a per-frame copy loop
(reference ``src/stft.rs:147-169``), we build all frames at once as a gather
with static shapes, which XLA lowers to efficient dynamic-slice/concat code,
and keep the frame count a Python-level (static) value so everything stays
jit-compatible.

Frame-count semantics preserved exactly:
- batch (whisper / fbank): ``num_frames = (len - fft) // hop + 1``; zero
  frames when ``len < fft`` (reference ``src/stft.rs:157``,
  ``src/fbank.rs:151``).
- NeMo centered: ``num_frames = len // hop + 1`` (reference
  ``src/mel.rs:387-395``).
- streaming overlap-and-save equivalence: the reference's streaming path
  (``src/stft.rs:48-86``) zero-pads the *front* of its hop buffer, so its
  k-th emitted frame starts at ``first_hops*hop - fft + k*hop`` where
  ``first_hops = ceil(fft/hop)``; ``streaming_frame_offset`` exposes that
  offset so batch calls can reproduce streaming output bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import jax.lax
import jax.numpy as jnp


def num_frames_batch(n_samples: int, fft_size: int, hop_size: int) -> int:
    """Whisper/fbank batch frame count (reference ``src/stft.rs:157``)."""
    if n_samples < fft_size:
        return 0
    return (n_samples - fft_size) // hop_size + 1


def num_frames_centered(n_samples: int, hop_size: int) -> int:
    """NeMo centered frame count (reference ``src/mel.rs:387-390``)."""
    return n_samples // hop_size + 1


def streaming_frame_offset(fft_size: int, hop_size: int) -> int:
    """Sample offset of the first frame the streaming path emits.

    The streaming hop-buffer is zero-initialized and shifts left by
    ``hop_size`` per chunk, emitting once ``idx >= fft_size``
    (reference ``src/stft.rs:48-86``); the first emission happens after
    ``ceil(fft/hop)`` hops and covers samples
    ``[first_hops*hop - fft, first_hops*hop)``.
    """
    first_hops = -(-fft_size // hop_size)
    return first_hops * hop_size - fft_size


def num_frames_streaming(n_samples: int, fft_size: int, hop_size: int) -> int:
    """Number of frames the streaming path emits for ``n_samples`` pushed
    in hop-sized chunks (leftover < hop is never processed —
    reference ``src/rb.rs:108-110``)."""
    n_hops = n_samples // hop_size
    first_hops = -(-fft_size // hop_size)
    return max(0, n_hops - first_hops + 1)


def frame_signal(
    samples: jnp.ndarray,
    fft_size: int,
    hop_size: int,
    num_frames: int,
    offset: int = 0,
) -> jnp.ndarray:
    """Extract ``[..., num_frames, fft_size]`` overlapping frames.

    ``samples`` is ``[..., T]``; frame ``k`` covers
    ``samples[..., offset + k*hop : offset + k*hop + fft]``.

    TPU-first implementation: rather than a gather (whose cost explodes on
    long clips), the signal is viewed as contiguous blocks of
    ``g = gcd(fft, hop, offset)`` samples; every frame is then ``fft/g``
    consecutive blocks, so framing becomes ``fft/g`` strided slices +
    stack + reshape — pure data movement XLA lays out efficiently. Falls
    back to a gather when the block decomposition would be degenerate.
    """
    if num_frames <= 0:
        # num_frames_batch/num_frames_streaming legitimately return 0 for
        # short inputs; the fast path's strided slices cannot express it
        return jnp.zeros(samples.shape[:-1] + (0, fft_size),
                         dtype=samples.dtype)
    needed = offset + (num_frames - 1) * hop_size + fft_size
    if samples.shape[-1] < needed:
        raise ValueError(
            f"samples too short: have {samples.shape[-1]}, need {needed}"
        )

    g = math.gcd(fft_size, hop_size)
    if offset:
        g = math.gcd(g, offset)
    m = fft_size // g  # blocks per frame
    if g >= 8 and m <= 64:
        hop_b = hop_size // g
        off_b = offset // g
        n_blocks_needed = off_b + hop_b * (num_frames - 1) + m
        usable = n_blocks_needed * g
        blocks = samples[..., :usable].reshape(samples.shape[:-1] + (-1, g))
        parts = [
            jax.lax.slice_in_dim(
                blocks,
                off_b + j,
                off_b + j + hop_b * (num_frames - 1) + 1,
                stride=hop_b,
                axis=blocks.ndim - 2,
            )
            for j in range(m)
        ]
        frames = jnp.stack(parts, axis=-2)  # [..., num_frames, m, g]
        return frames.reshape(samples.shape[:-1] + (num_frames, fft_size))

    idx = offset + np.arange(num_frames)[:, None] * hop_size + np.arange(fft_size)
    return samples[..., idx]
