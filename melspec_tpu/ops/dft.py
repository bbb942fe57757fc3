"""Real DFT as dense matmuls — the MXU-native FFT.

Rationale (SURVEY.md §7 step 7): the reference needs cuFFT (``src/cuda.rs``)
and a 6-stage Bluestein WGSL chain for non-power-of-two sizes
(``src/wgpu.rs:621-711``). On TPU the FLOP-rich path is the MXU, and the
frontend's FFT sizes are tiny (400/512), so an explicit real-DFT matmul
``[frames, fft] @ [fft, bins]`` is both simpler and faster than any
butterfly schedule: it is one fused matmul per (cos, sin) component, feeds
the systolic array at full tilt, and handles any fft size with zero special
cases. Matrices are built once on host in float64 and cast to the pipeline
dtype.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def rdft_matrices(fft_size: int, n_bins: int) -> Tuple[np.ndarray, np.ndarray]:
    """Return ``(cos, -sin)`` matrices of shape ``[fft_size, n_bins]`` (float64).

    For real input ``x`` of length ``fft_size``::

        re[k] = sum_n x[n] * cos(2*pi*k*n/N)   = x @ cos_mat
        im[k] = sum_n x[n] * -sin(2*pi*k*n/N)  = x @ msin_mat

    matching ``numpy.fft.rfft`` layout for ``k < n_bins``.
    """
    n = np.arange(fft_size, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fft_size
    return np.cos(ang), -np.sin(ang)


def rdft_power(
    frames: jnp.ndarray,
    fft_size: int,
    n_bins: int,
    dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Power spectrum ``|rfft(frames)|**2`` over the first ``n_bins`` bins via
    two MXU matmuls. ``frames`` is ``[..., fft_size]``; returns
    ``[..., n_bins]``.

    ``precision`` defaults to HIGHEST: on TPU the default matmul precision
    is bf16 passes, which would silently break the f32 accuracy claims of
    every parity gate. Callers chasing throughput over parity can pass
    ``jax.lax.Precision.DEFAULT`` explicitly.
    """
    cos_m, msin_m = rdft_matrices(fft_size, n_bins)
    cos_m = jnp.asarray(cos_m, dtype=dtype)
    msin_m = jnp.asarray(msin_m, dtype=dtype)
    frames = frames.astype(dtype)
    re = jnp.matmul(frames, cos_m, precision=precision)
    im = jnp.matmul(frames, msin_m, precision=precision)
    return re * re + im * im


def rfft_via_matmul(
    frames: jnp.ndarray,
    fft_size: int,
    n_bins: int,
    dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(re, im) of the rFFT over the first ``n_bins`` bins via matmuls."""
    cos_m, msin_m = rdft_matrices(fft_size, n_bins)
    cos_m = jnp.asarray(cos_m, dtype=dtype)
    msin_m = jnp.asarray(msin_m, dtype=dtype)
    frames = frames.astype(dtype)
    return (
        jnp.matmul(frames, cos_m, precision=precision),
        jnp.matmul(frames, msin_m, precision=precision),
    )
