"""Fused Pallas TPU kernel: samples -> whisper log-mel, one pass.

This is the TPU replacement for the reference's accelerator backends — the
cuFFT + CUDA mel kernel (``src/cuda.rs``, ``src/cuda_kernels.cu:5-47``) and
the multi-dispatch wgpu FFT chain (``src/wgpu.rs:497-711``). Their shape:
host windowing, device FFT, device sparse-ish dot, host normalization, with
every stage a separate dispatch and an HBM round-trip. Here the entire
pipeline runs in one kernel per 256-frame tile, entirely out of VMEM:

    DMA sample slab (HBM->VMEM)
    -> phase-decomposed framing (contiguous slices, no gather)
    -> windowed real-DFT as two MXU matmuls (window folded into the
       DFT matrices; handles ANY fft size — no Bluestein special case,
       cf. the reference's 6-stage chain for fft=400, src/wgpu.rs:621-711)
    -> power -> dense mel matmul (MXU) -> log10 -> whisper norm
    -> one [frames, mels] tile written back

Framing without strides: with ``W = q*hop`` where ``q = max(2, ceil(fft/hop)
- 1)`` wait — q is chosen as the smallest q with ``fft <= (q+1)*hop``, every
frame fits in two consecutive W-wide rows of the sample matrix: frame
``k = q*m + r`` is ``rows[m][r*hop:] ++ rows[m+1][:fft-(W-r*hop)]``. The
kernel loops the (static, tiny) ``q`` phases and concatenates phase outputs
along the lane axis, so the whole tile is pure contiguous vector ops + MXU.

Sample traffic is read once (165 KB/tile vs the 2.5x blowup of
materializing overlapped frames in HBM), and only 1 output byte per 4 input
bytes is written back.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from melspec_tpu.ops import dft, framing
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.ops.windows import hann_periodic

LANES = 128
LOG10_FLOOR = 1e-10


def _kernel_params(fft_size: int, hop_size: int, rows_per_tile: int):
    """Derive the phase decomposition: q phases, row width W = q*hop."""
    q = max(1, -(-fft_size // hop_size) - 1)
    while fft_size > (q + 1) * hop_size:
        q += 1
    w = q * hop_size
    assert fft_size <= 2 * w, "frame must fit in two rows"
    return q, w, rows_per_tile * q  # frames per tile


def _build_matrices(
    fft_size: int, n_mels: int, sampling_rate: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Window-folded DFT matrices [fft, n_bins_pad] and the padded mel
    projection [n_bins_pad, n_mels_pad] (float64 host build)."""
    half = fft_size // 2  # the whisper projection zeroes bins >= fft/2
    n_bins_pad = -(-half // LANES) * LANES
    n_mels_pad = -(-n_mels // LANES) * LANES

    cos_m, msin_m = dft.rdft_matrices(fft_size, half)
    window = hann_periodic(fft_size)
    cw = np.zeros((fft_size, n_bins_pad))
    sw = np.zeros((fft_size, n_bins_pad))
    cw[:, :half] = window[:, None] * cos_m
    sw[:, :half] = window[:, None] * msin_m

    filters = mel_filterbank(sampling_rate, fft_size, n_mels)  # [n_mels, half+1]
    mt = np.zeros((n_bins_pad, n_mels_pad))
    mt[:half, :n_mels] = filters[:, :half].T
    return cw, sw, mt, n_bins_pad, n_mels_pad


def _mel_tile_kernel(
    rows_ref,      # ANY/HBM: [R, W] sample rows for this batch element
    cw_ref,        # VMEM: [fft, n_bins_pad] cos * window
    sw_ref,        # VMEM: [fft, n_bins_pad] -sin * window
    mt_ref,        # VMEM: [n_bins_pad, n_mels_pad] mel projection
    out_ref,       # VMEM: [M, q * n_mels_pad] output tile
    slab_ref,      # scratch VMEM: [M+1, W]
    sem,           # DMA semaphore
    *,
    fft_size: int,
    hop_size: int,
    q: int,
    w: int,
    m_rows: int,
):
    j = pl.program_id(0)
    copy = pltpu.make_async_copy(
        rows_ref.at[pl.ds(j * m_rows, m_rows + 1), :],
        slab_ref,
        sem,
    )
    copy.start()
    copy.wait()

    slab = slab_ref[:]  # [M+1, W]
    head = slab[:-1]    # rows m
    tail = slab[1:]     # rows m+1

    outs = []
    for r in range(q):
        lo = r * hop_size
        take_head = w - lo
        if fft_size <= take_head:
            fr = head[:, lo : lo + fft_size]
        else:
            fr = jnp.concatenate(
                [head[:, lo:], tail[:, : fft_size - take_head]], axis=1
            )
        re = jnp.dot(fr, cw_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(fr, sw_ref[:], preferred_element_type=jnp.float32)
        power = re * re + im * im
        energy = jnp.dot(power, mt_ref[:], preferred_element_type=jnp.float32)
        log_mel = jnp.log10(jnp.maximum(energy, LOG10_FLOOR))
        mmax = jnp.max(log_mel, axis=1, keepdims=True) - 8.0
        outs.append((jnp.maximum(log_mel, mmax) + 4.0) * 0.25)

    out_ref[:] = jnp.concatenate(outs, axis=1)  # [M, q * n_mels_pad]


@functools.partial(
    jax.jit,
    static_argnames=(
        "fft_size", "hop_size", "n_mels", "sampling_rate",
        "rows_per_tile", "interpret",
    ),
)
def _pallas_mel_padded(
    rows: jnp.ndarray,  # [B, R, W] float32
    *,
    fft_size: int,
    hop_size: int,
    n_mels: int,
    sampling_rate: float,
    rows_per_tile: int,
    interpret: bool,
) -> jnp.ndarray:
    q, w, frames_per_tile = _kernel_params(fft_size, hop_size, rows_per_tile)
    cw, sw, mt, n_bins_pad, n_mels_pad = _build_matrices(
        fft_size, n_mels, sampling_rate
    )
    cw = jnp.asarray(cw, jnp.float32)
    sw = jnp.asarray(sw, jnp.float32)
    mt = jnp.asarray(mt, jnp.float32)

    batch, r_total, w_in = rows.shape
    assert w_in == w
    m_rows = rows_per_tile
    n_tiles = (r_total - 1) // m_rows
    assert n_tiles * m_rows + 1 <= r_total

    kernel = functools.partial(
        _mel_tile_kernel,
        fft_size=fft_size, hop_size=hop_size, q=q, w=w, m_rows=m_rows,
    )

    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mt
        ],
        out_specs=pl.BlockSpec(
            (m_rows, q * n_mels_pad), lambda j: (j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * m_rows, q * n_mels_pad), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((m_rows + 1, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    out = jax.vmap(lambda rows_b: call(rows_b, cw, sw, mt))(rows)
    # [B, n_tiles*M, q*n_mels_pad] -> [B, frames, n_mels_pad]
    out = out.reshape(batch, n_tiles * m_rows * q, n_mels_pad)
    return out


def whisper_mel_pallas(
    samples,
    fft_size: int = 400,
    hop_size: int = 160,
    n_mels: int = 80,
    sampling_rate: float = 16000.0,
    streaming: bool = False,
    rows_per_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whisper log-mel via the fused Pallas kernel.

    ``samples``: ``[T]`` or ``[B, T]`` float32. Returns
    ``[..., n_frames, n_mels]`` (batch framing) or, with
    ``streaming=True``, the streaming-equivalent frames (offset by
    ``ceil(fft/hop)*hop - fft`` like the reference ring pipeline) in the
    same frame-major layout — transpose for the golden's feature-major
    view.
    """
    x = jnp.asarray(samples, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]

    offset = 0
    n = x.shape[-1]
    if streaming:
        offset = framing.streaming_frame_offset(fft_size, hop_size)
        n_frames = framing.num_frames_streaming(n, fft_size, hop_size)
        usable = (n // hop_size) * hop_size
        x = x[:, offset:usable]
    else:
        n_frames = framing.num_frames_batch(n, fft_size, hop_size)
    if n_frames <= 0:
        out = jnp.zeros((x.shape[0], 0, n_mels), jnp.float32)
        return out[0] if squeeze else out

    q, w, frames_per_tile = _kernel_params(fft_size, hop_size, rows_per_tile)
    n_tiles = -(-n_frames // frames_per_tile)
    needed = (n_tiles * rows_per_tile + 1) * w
    if x.shape[-1] < needed:
        x = jnp.pad(x, ((0, 0), (0, needed - x.shape[-1])))
    else:
        x = x[:, :needed]
    rows = x.reshape(x.shape[0], -1, w)

    out = _pallas_mel_padded(
        rows,
        fft_size=fft_size, hop_size=hop_size, n_mels=n_mels,
        sampling_rate=float(sampling_rate), rows_per_tile=rows_per_tile,
        interpret=interpret,
    )
    out = out[:, :n_frames, :n_mels]
    return out[0] if squeeze else out
