"""Fused Pallas TPU kernel: framed samples -> whisper log-mel, one pass.

This is the TPU replacement for the reference's accelerator backends — the
cuFFT + CUDA mel kernel (``src/cuda.rs``, ``src/cuda_kernels.cu:5-47``) and
the multi-dispatch wgpu FFT chain (``src/wgpu.rs:497-711``). Their shape:
host windowing, device FFT, device mel dot-product, host normalization —
every stage a separate dispatch with an HBM round-trip between them. Here
the whole feature pipeline is ONE kernel over 256-frame tiles, with
``pallas_call``'s automatic block pipelining double-buffering the tile
loads:

    [256, fft] frame tile (VMEM)
    -> windowed real-DFT as two MXU matmuls (window folded into the DFT
       matrices; handles ANY fft size with zero special cases — compare
       the reference's 6-stage Bluestein chain for fft=400,
       src/wgpu.rs:621-711)
    -> power -> dense mel matmul (MXU) -> log10 floor -> whisper norm
    -> one [256, n_mels] tile out

Framing itself stays in XLA (the gcd-block reshape of
``ops.framing.frame_signal`` — pure data movement), so the kernel's operand
blocks are dense and tile-aligned; only log-mel bytes are written back.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from melspec_tpu.ops import dft, framing
from melspec_tpu.ops.fastmath import log10_accurate
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.ops.windows import hann_periodic

LANES = 128
LOG10_FLOOR = 1e-10
TILE_FRAMES = 256


def _build_matrices(
    fft_size: int, n_mels: int, sampling_rate: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Window-folded DFT matrices ``[fft, n_bins_pad]`` and the padded mel
    projection ``[n_bins_pad, n_mels_pad]`` (float64 host build, cast by
    the caller)."""
    half = fft_size // 2  # the whisper projection zeroes bins >= fft/2
    n_bins_pad = -(-half // LANES) * LANES
    n_mels_pad = -(-n_mels // LANES) * LANES
    k_pad = -(-fft_size // LANES) * LANES  # contraction dim, tile-aligned

    cos_m, msin_m = dft.rdft_matrices(fft_size, half)
    window = hann_periodic(fft_size)
    cw = np.zeros((k_pad, n_bins_pad))
    sw = np.zeros((k_pad, n_bins_pad))
    cw[:fft_size, :half] = window[:, None] * cos_m
    sw[:fft_size, :half] = window[:, None] * msin_m

    filters = mel_filterbank(sampling_rate, fft_size, n_mels)  # [n_mels, half+1]
    mt = np.zeros((n_bins_pad, n_mels_pad))
    mt[:half, :n_mels] = filters[:, :half].T
    return cw, sw, mt, n_bins_pad, n_mels_pad, k_pad


def _mel_tile_kernel(frames_ref, cw_ref, sw_ref, mt_ref, out_ref):
    # Mosaic's default f32 dot is a single bf16 pass (rel err ~2^-8);
    # request full f32 passes explicitly
    hp = jax.lax.Precision.HIGHEST
    fr = frames_ref[:]
    re = jnp.dot(fr, cw_ref[:], preferred_element_type=jnp.float32,
                 precision=hp)
    im = jnp.dot(fr, sw_ref[:], preferred_element_type=jnp.float32,
                 precision=hp)
    power = re * re + im * im
    energy = jnp.dot(power, mt_ref[:], preferred_element_type=jnp.float32,
                     precision=hp)
    # padded mel lanes have zero energy -> exactly the -10 floor, so the
    # row max over all lanes equals the max over the true mel bins
    log_mel = log10_accurate(jnp.maximum(energy, LOG10_FLOOR))
    mmax = jnp.max(log_mel, axis=1, keepdims=True) - 8.0
    out_ref[:] = (jnp.maximum(log_mel, mmax) + 4.0) * 0.25


def _hp_mel_tile_kernel(*refs, n_slices: int, max_pair_sum: int):
    """Fused Ozaki-split whisper-mel tile: raw [tile, k_pad] frames in,
    normalized log-mel out, every DFT FLOP an exact bf16 MXU matmul (see
    ``ops/hp_dft.py`` for the numerical argument)."""
    frames_ref, mt_ref, cs_all_ref, ss_all_ref, out_ref = refs

    fr = frames_ref[:]
    row_max = jnp.max(jnp.abs(fr), axis=1, keepdims=True)
    # power-of-two row scale via exact exponent extraction (the VPU's
    # log2/exp2 are approximations; bit ops are exact): sigma = 2^(e-126)
    # >= row_max, so |fr/sigma| <= 1
    bits = jax.lax.bitcast_convert_type(
        jnp.maximum(row_max, 1e-38), jnp.int32
    )
    exp = (bits >> 23) & 0xFF
    sigma = jax.lax.bitcast_convert_type((exp + 1) << 23, jnp.float32)
    residual = fr / sigma

    x_slices = []
    for _ in range(n_slices):
        scaled = residual * 128.0
        t = jnp.trunc(scaled)
        residual = scaled - t
        x_slices.append(t.astype(jnp.bfloat16))

    def two_sum(a, b):
        s = a + b
        bb = s - a
        return s, (a - (s - bb)) + (b - bb)

    def component(mat_ref):
        # one WIDE matmul per signal slice against the column-concatenated
        # matrix planes [k_pad, n_slices * n_bins_pad]; group same-scale
        # pairs with exact-enough plain adds, then a short compensated
        # chain over the <= 6 scaled groups
        c_all = mat_ref[:]
        n_bins_pad = c_all.shape[1] // n_slices
        groups = {}
        for i, xs in enumerate(x_slices):
            y_all = jnp.dot(xs, c_all, preferred_element_type=jnp.float32)
            for j in range(n_slices):
                if i + j > max_pair_sum:
                    continue
                y = y_all[:, j * n_bins_pad : (j + 1) * n_bins_pad]
                s = i + j
                groups[s] = y if s not in groups else groups[s] + y
        terms = [groups[s] * (128.0 ** (-(s + 2))) for s in sorted(groups)]
        hi = terms[0]
        lo = jnp.zeros_like(hi)
        for t in terms[1:]:
            hi, err = two_sum(hi, t)
            lo = lo + err
        return two_sum(hi, lo)

    re_hi, re_lo = component(cs_all_ref)
    im_hi, im_lo = component(ss_all_ref)
    power = (
        re_hi * re_hi + im_hi * im_hi + 2.0 * (re_hi * re_lo + im_hi * im_lo)
    ) * (sigma * sigma)

    energy = jnp.dot(power, mt_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    log_mel = log10_accurate(jnp.maximum(energy, LOG10_FLOOR))
    mmax = jnp.max(log_mel, axis=1, keepdims=True) - 8.0
    out_ref[:] = (jnp.maximum(log_mel, mmax) + 4.0) * 0.25


@functools.lru_cache(maxsize=8)
def _hp_device_matrices(fft_size: int, n_mels: int, sampling_rate: float,
                        n_slices: int):
    """Device-resident sliced matrices, built once per config. Passed to
    the jitted kernels as ARGUMENTS, not closure constants: embedded HLO
    constants can be re-shipped on every execute by remote runtimes."""
    from melspec_tpu.ops.hp_dft import matrix_slices
    from melspec_tpu.ops.windows import hann_periodic as _hann

    half = fft_size // 2
    n_bins_pad = -(-half // LANES) * LANES
    n_mels_pad = -(-n_mels // LANES) * LANES
    k_pad = -(-fft_size // LANES) * LANES

    cos_m, msin_m = dft.rdft_matrices(fft_size, half)
    w = _hann(fft_size)[:, None]
    cw = np.zeros((k_pad, n_bins_pad))
    sw = np.zeros((k_pad, n_bins_pad))
    cw[:fft_size, :half] = w * cos_m
    sw[:fft_size, :half] = w * msin_m
    cs = jnp.asarray(np.concatenate(matrix_slices(cw, n_slices), axis=1),
                     jnp.bfloat16)
    ss = jnp.asarray(np.concatenate(matrix_slices(sw, n_slices), axis=1),
                     jnp.bfloat16)

    filters = mel_filterbank(sampling_rate, fft_size, n_mels)
    mt = np.zeros((n_bins_pad, n_mels_pad))
    mt[:half, :n_mels] = filters[:, :half].T
    return cs, ss, jnp.asarray(mt, jnp.float32), n_bins_pad, n_mels_pad, k_pad


@functools.lru_cache(maxsize=8)
def _f32_device_matrices(fft_size: int, n_mels: int, sampling_rate: float):
    cw, sw, mt, n_bins_pad, n_mels_pad, k_pad = _build_matrices(
        fft_size, n_mels, sampling_rate
    )
    return (
        jnp.asarray(cw, jnp.float32),
        jnp.asarray(sw, jnp.float32),
        jnp.asarray(mt, jnp.float32),
        n_bins_pad, n_mels_pad, k_pad,
    )


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "n_slices", "max_pair_sum", "tile_frames"),
)
def _pallas_hp_mel_frames(
    frames: jnp.ndarray,  # [N, k_pad] float32 RAW (unwindowed) frames
    cs, ss, mt,
    *,
    interpret: bool,
    n_slices: int = 5,
    max_pair_sum: int = 5,
    tile_frames: int = 512,
) -> jnp.ndarray:
    n, k_pad = frames.shape
    n_mels_pad = mt.shape[1]
    assert n % tile_frames == 0
    n_tiles = n // tile_frames

    kernel = functools.partial(
        _hp_mel_tile_kernel, n_slices=n_slices, max_pair_sum=max_pair_sum
    )
    n_pairs = sum(1 for i in range(n_slices) for j in range(n_slices)
                  if i + j <= max_pair_sum)
    n_bins_pad = mt.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_frames, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mt
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cs (wide)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ss (wide)
        ],
        out_specs=pl.BlockSpec((tile_frames, n_mels_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pairs * 2 * n * k_pad * n_bins_pad
            + 2 * n * n_bins_pad * n_mels_pad,
            bytes_accessed=(n * k_pad + n * n_mels_pad) * 4,
            transcendentals=n * n_mels_pad,
        ),
        interpret=interpret,
    )(frames, mt, cs, ss)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_mel_frames(
    frames: jnp.ndarray,  # [N, k_pad] float32, N a multiple of TILE_FRAMES
    cw, sw, mt,
    *,
    interpret: bool,
) -> jnp.ndarray:
    n, k_pad = frames.shape
    n_bins_pad, n_mels_pad = mt.shape
    assert n % TILE_FRAMES == 0
    n_tiles = n // TILE_FRAMES

    flops_tile = (
        2 * 2 * TILE_FRAMES * k_pad * n_bins_pad
        + 2 * TILE_FRAMES * n_bins_pad * n_mels_pad
    )
    return pl.pallas_call(
        _mel_tile_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_FRAMES, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_FRAMES, n_mels_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_tile * n_tiles,
            bytes_accessed=(n * k_pad + n * n_mels_pad) * 4,
            transcendentals=n * n_mels_pad,
        ),
        interpret=interpret,
    )(frames, cw, sw, mt)


def whisper_mel_pallas(
    samples,
    fft_size: int = 400,
    hop_size: int = 160,
    n_mels: int = 80,
    sampling_rate: float = 16000.0,
    streaming: bool = False,
    interpret: bool = False,
    hp: bool = False,
    hp_n_slices: int = 5,
    hp_max_pair_sum: int = 5,
) -> jnp.ndarray:
    """Whisper log-mel via the fused Pallas kernel.

    ``samples``: ``[T]`` or ``[B, T]`` float32. Returns
    ``[..., n_frames, n_mels]`` (batch framing) or, with
    ``streaming=True``, the streaming-equivalent frames (offset by
    ``ceil(fft/hop)*hop - fft``, reference ring-pipeline semantics) in the
    same frame-major layout — transpose for the golden's feature-major
    view.
    """
    x = jnp.asarray(samples, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]

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

    batch = x.shape[0]
    total = batch * n_frames
    tile = 512 if hp else TILE_FRAMES  # measured-best tile sizes (v5e)
    total_pad = -(-total // tile) * tile
    # pad the signal so framing stays in bounds, then pad the frame count
    needed = (n_frames - 1) * hop_size + fft_size
    if x.shape[-1] < needed:
        x = jnp.pad(x, ((0, 0), (0, needed - x.shape[-1])))
    frames = framing.frame_signal(x, fft_size, hop_size, n_frames)
    frames = frames.reshape(total, fft_size)
    k_pad = -(-fft_size // LANES) * LANES
    frames = jnp.pad(
        frames, ((0, total_pad - total), (0, k_pad - fft_size))
    )

    if hp:
        cs, ss, mt, _, _, _ = _hp_device_matrices(
            fft_size, n_mels, float(sampling_rate), hp_n_slices
        )
        out = _pallas_hp_mel_frames(
            frames, cs, ss, mt, interpret=interpret, tile_frames=tile,
            n_slices=hp_n_slices, max_pair_sum=hp_max_pair_sum,
        )
    else:
        cw, sw, mt, _, _, _ = _f32_device_matrices(
            fft_size, n_mels, float(sampling_rate)
        )
        out = _pallas_mel_frames(frames, cw, sw, mt, interpret=interpret)
    out = out[:total, :n_mels].reshape(batch, n_frames, n_mels)
    return out[0] if squeeze else out
