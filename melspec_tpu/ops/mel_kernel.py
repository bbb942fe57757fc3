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


def _host_built(fn):
    """Build device matrices OUTSIDE any active trace.

    The matrix builders are cached (``lru_cache`` here, attributes on the
    frontend objects elsewhere) and may be first called from INSIDE a
    user's ``jax.jit`` trace (e.g. a pipeline whose ``_mel_batch_jit``
    routes to the sig kernel). Without this guard the ``jnp.asarray``
    constants would be created as tracers of that outer trace, cached,
    and leak into every later trace as ``UnexpectedTracerError``."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.ensure_compile_time_eval():
            return fn(*args, **kwargs)

    return wrapper


def _build_matrices(
    fft_size: int, n_mels: int, sampling_rate: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, int, int]:
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
    # clamp so exp+1 stays a finite exponent: |x| >= 2^127 (or inf/NaN
    # garbage input) would otherwise make sigma inf (or the -0.0 bit
    # pattern) and silently zero the whole row
    exp = jnp.minimum((bits >> 23) & 0xFF, 0xFD)
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


def _matrix_slices_i8(mat: np.ndarray, n_slices: int) -> list:
    """7-bit integer slices CLIPPED to the int8 range. Unlike the bf16
    slices (``hp_dft.matrix_slices``), int8 cannot hold ±128 — which the
    window-folded DFT matrices do hit (the frame-center row has
    ``|w*cos| = 1``). Clipping to ±127 keeps every plane int8-exact; the
    clipped remainder flows into the next plane's residual, so the
    truncation tail stays <= 128^-n_slices."""
    out = []
    residual = np.asarray(mat, np.float64).copy()
    for _ in range(n_slices):
        t = np.clip(np.trunc(residual * 128.0), -127.0, 127.0)
        residual = residual * 128.0 - t
        out.append(t.astype(np.int8))
    return out


def _hp8_plane_widths(ks: int, km: int, cutoff: int) -> list:
    """Number of matrix planes signal slice ``i`` is paired with. Signal
    slices beyond ``cutoff`` pair with nothing (their contribution is
    dropped by the pair-sum budget), so ``ks`` is clamped — callers
    passing ks > cutoff+1 used to produce empty plane concatenations and
    crash in numpy."""
    return [min(cutoff - i, km - 1) + 1 for i in range(min(ks, cutoff + 1))]


@functools.lru_cache(maxsize=8)
@_host_built
def _hp8_device_matrices(fft_size: int, n_mels: int, sampling_rate: float,
                         ks: int, km: int, cutoff: int):
    """Per-signal-slice concatenated int8 DFT plane matrices.

    For signal slice ``i`` only the matrix planes ``j <= cutoff - i`` are
    ever used, so slice i gets its own concatenation
    ``[cos_0..cos_J | sin_0..sin_J]`` (each plane ``[k_pad, n_bins_pad]``)
    — no slice-pair product is computed and thrown away, unlike the
    uniform wide matmul of the bf16 kernel. int8 x int8 -> int32 runs the
    MXU at twice the bf16 rate and every product is EXACT (7-bit slices:
    |a*b| <= 16129, 400-element dots < 2^23)."""
    half = fft_size // 2
    n_bins_pad = -(-half // LANES) * LANES
    n_mels_pad = -(-n_mels // LANES) * LANES
    k_pad = -(-fft_size // LANES) * LANES

    cos_m, msin_m = dft.rdft_matrices(fft_size, half)
    w = hann_periodic(fft_size)[:, None]
    cw = np.zeros((k_pad, n_bins_pad))
    sw = np.zeros((k_pad, n_bins_pad))
    cw[:fft_size, :half] = w * cos_m
    sw[:fft_size, :half] = w * msin_m
    cos_planes = _matrix_slices_i8(cw, km)
    sin_planes = _matrix_slices_i8(sw, km)

    slice_mats = tuple(
        jnp.asarray(
            np.concatenate(cos_planes[:n_p] + sin_planes[:n_p], axis=1)
        )
        for n_p in _hp8_plane_widths(ks, km, cutoff)
    )

    filters = mel_filterbank(sampling_rate, fft_size, n_mels)
    mt = np.zeros((n_bins_pad, n_mels_pad))
    mt[:half, :n_mels] = filters[:, :half].T
    return slice_mats, jnp.asarray(mt, jnp.float32), n_bins_pad, n_mels_pad, k_pad


def _hp8_mel_tile_kernel(*refs, ks: int, km: int, cutoff: int,
                         n_bins_pad: int):
    """Fused int8-Ozaki whisper-mel tile: raw f32 frames in, normalized
    log-mel out. Per signal slice ONE int8 MXU matmul against that slice's
    concatenated planes; same-scale (i+j) groups accumulate in int32
    (exact — sums stay under 2^31; the s<=1 groups even convert to f32
    exactly), then a short compensated f32 chain over the <= cutoff+1
    scaled groups."""
    frames_ref, mt_ref = refs[0], refs[1]
    plane_refs = refs[2 : 2 + ks]
    out_ref = refs[2 + ks]

    fr = frames_ref[:]
    row_max = jnp.max(jnp.abs(fr), axis=1, keepdims=True)
    # power-of-two row scale sigma = 2^(e+1) > row_max via exact exponent
    # bit ops, so |fr/sigma| < 1 and every 7-bit slice fits int8
    bits = jax.lax.bitcast_convert_type(
        jnp.maximum(row_max, 1e-38), jnp.int32
    )
    sigma = jax.lax.bitcast_convert_type(
        ((jnp.minimum((bits >> 23) & 0xFF, 0xFD) + 1) << 23), jnp.float32
    )
    residual = fr / sigma

    groups_re: dict = {}
    groups_im: dict = {}
    for i in range(ks):
        scaled = residual * 128.0
        t = jnp.trunc(scaled)
        residual = scaled - t
        xs = t.astype(jnp.int8)
        n_p = min(cutoff - i, km - 1) + 1
        y = jnp.dot(xs, plane_refs[i][:], preferred_element_type=jnp.int32)
        for j in range(n_p):
            s = i + j
            yr = y[:, j * n_bins_pad : (j + 1) * n_bins_pad]
            yi = y[:, (n_p + j) * n_bins_pad : (n_p + j + 1) * n_bins_pad]
            groups_re[s] = yr if s not in groups_re else groups_re[s] + yr
            groups_im[s] = yi if s not in groups_im else groups_im[s] + yi

    def two_sum(a, b):
        s = a + b
        bb = s - a
        return s, (a - (s - bb)) + (b - bb)

    def combine(groups):
        terms = [groups[s].astype(jnp.float32) * (128.0 ** (-(s + 2)))
                 for s in sorted(groups)]
        hi = terms[0]
        lo = jnp.zeros_like(hi)
        for t in terms[1:]:
            hi, err = two_sum(hi, t)
            lo = lo + err
        return two_sum(hi, lo)

    re_hi, re_lo = combine(groups_re)
    im_hi, im_lo = combine(groups_im)
    power = (
        re_hi * re_hi + im_hi * im_hi + 2.0 * (re_hi * re_lo + im_hi * im_lo)
    ) * (sigma * sigma)

    energy = jnp.dot(power, mt_ref[:], preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    log_mel = log10_accurate(jnp.maximum(energy, LOG10_FLOOR))
    mmax = jnp.max(log_mel, axis=1, keepdims=True) - 8.0
    out_ref[:] = (jnp.maximum(log_mel, mmax) + 4.0) * 0.25


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "ks", "km", "cutoff", "tile_frames"),
)
def _pallas_hp8_mel_frames(
    frames: jnp.ndarray,  # [N, k_pad] float32 RAW (unwindowed) frames
    mt, *slice_mats,
    interpret: bool,
    ks: int,
    km: int,
    cutoff: int,
    tile_frames: int,
) -> jnp.ndarray:
    n, k_pad = frames.shape
    n_bins_pad, n_mels_pad = mt.shape
    assert n % tile_frames == 0
    n_tiles = n // tile_frames

    kernel = functools.partial(
        _hp8_mel_tile_kernel, ks=ks, km=km, cutoff=cutoff,
        n_bins_pad=n_bins_pad,
    )
    total_cols = sum(m.shape[1] for m in slice_mats)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_frames, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mt
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(slice_mats),
        out_specs=pl.BlockSpec((tile_frames, n_mels_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_pad * total_cols
            + 2 * n * n_bins_pad * n_mels_pad,
            bytes_accessed=(n * k_pad + n * n_mels_pad) * 4,
            transcendentals=n * n_mels_pad,
        ),
        interpret=interpret,
    )(frames, mt, *slice_mats)


def _bf16_round_slices(mat: np.ndarray, n_slices: int) -> list:
    """Rounded bfloat16 slices (one shared implementation — the bf3
    kernels' correctness argument depends on the exact rounding scheme, so
    there must be exactly one copy of it): ``mat = sum_j M_j + tail`` with
    ``|M_j| <= 2^-8j |mat|`` elementwise; scale-free, 3 slices carry
    ~24+ bits."""
    from melspec_tpu.ops.hp_dft import bf16_round_slices

    return list(bf16_round_slices(mat, n_slices))


@functools.lru_cache(maxsize=8)
@_host_built
def _bf3_device_matrices(fft_size: int, n_mels: int, sampling_rate: float,
                         ks: int, km: int, cutoff: int):
    """Per-signal-slice concatenated bf16 DFT plane matrices for the
    3-slice scheme (layout mirrors ``_hp8_device_matrices``). The window
    is folded into the float64 matrices BEFORE slicing — the f32 product
    ``frames * window`` is exactly the 2^-24-per-sample noise source that
    puts the plain-XLA pipeline above the 1e-5 parity bar."""
    half = fft_size // 2
    n_bins_pad = -(-half // LANES) * LANES
    n_mels_pad = -(-n_mels // LANES) * LANES
    k_pad = -(-fft_size // LANES) * LANES

    cos_m, msin_m = dft.rdft_matrices(fft_size, half)
    w = hann_periodic(fft_size)[:, None]
    cw = np.zeros((k_pad, n_bins_pad))
    sw = np.zeros((k_pad, n_bins_pad))
    cw[:fft_size, :half] = w * cos_m
    sw[:fft_size, :half] = w * msin_m
    cos_planes = _bf16_round_slices(cw, km)
    sin_planes = _bf16_round_slices(sw, km)

    slice_mats = tuple(
        jnp.asarray(
            np.concatenate(
                [np.asarray(p, np.float32) for p in
                 cos_planes[:n_p] + sin_planes[:n_p]], axis=1
            ),
            jnp.bfloat16,
        )
        for n_p in _hp8_plane_widths(ks, km, cutoff)
    )

    filters = mel_filterbank(sampling_rate, fft_size, n_mels)
    mt = np.zeros((n_bins_pad, n_mels_pad))
    mt[:half, :n_mels] = filters[:, :half].T
    return slice_mats, jnp.asarray(mt, jnp.float32), n_bins_pad, n_mels_pad, k_pad


def _bf3_mel_tile_kernel(*refs, ks: int, km: int, cutoff: int,
                         n_bins_pad: int, mel_precision):
    """Fused bf16-3-slice whisper-mel tile.

    The numerical scheme: signal and window-folded DFT matrices are each
    split into ``ks``/``km`` ROUNDED bf16 slices (successive bf16
    roundings of the residual — scale-free, ~8 bits per level); slice
    pairs with ``i + j <= cutoff`` are computed as bf16 MXU matmuls with
    f32 accumulation and summed smallest-last. With (3, 3, 2) this is the
    SAME 6-pass MXU cost as one ``precision=HIGHEST`` f32 dot, but with
    the window exact (folded before slicing) and the pipeline fully fused
    — measured 1.5e-6 JFK parity vs the f64 reference, 9x under the 1e-5
    bar the plain-XLA f32 path misses (1.3e-5).
    """
    frames_ref, mt_ref = refs[0], refs[1]
    plane_refs = refs[2 : 2 + ks]
    out_ref = refs[2 + ks]

    residual = frames_ref[:]
    groups: dict = {}
    for i in range(ks):
        # astype is safe HERE (and reduce_precision is unimplemented in
        # Mosaic): unlike XLA's allow-excess-precision mode, Mosaic does
        # not fold `residual - f32(bf16(residual))` to zero — kernel JFK
        # parity is measured at 3.2e-6 on chip
        xs = residual.astype(jnp.bfloat16)
        if i + 1 < ks:
            residual = residual - xs.astype(jnp.float32)
        n_p = min(cutoff - i, km - 1) + 1
        y = jnp.dot(xs, plane_refs[i][:],
                    preferred_element_type=jnp.float32)
        for j in range(n_p):
            s = i + j
            yr = y[:, j * n_bins_pad : (j + 1) * n_bins_pad]
            yi = y[:, (n_p + j) * n_bins_pad : (n_p + j + 1) * n_bins_pad]
            if s not in groups:
                groups[s] = (yr, yi)
            else:
                groups[s] = (groups[s][0] + yr, groups[s][1] + yi)

    # sum pair groups largest-first (plain f32 adds: the terms decay by
    # 2^-8 per level, so the tail contributes below 2^-24 of the head)
    order = sorted(groups)
    re = groups[order[0]][0]
    im = groups[order[0]][1]
    for s in order[1:]:
        re = re + groups[s][0]
        im = im + groups[s][1]
    power = re * re + im * im

    energy = jnp.dot(power, mt_ref[:], preferred_element_type=jnp.float32,
                     precision=mel_precision)
    log_mel = log10_accurate(jnp.maximum(energy, LOG10_FLOOR))
    mmax = jnp.max(log_mel, axis=1, keepdims=True) - 8.0
    out_ref[:] = (jnp.maximum(log_mel, mmax) + 4.0) * 0.25


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "ks", "km", "cutoff", "tile_frames",
                     "mel_precision"),
)
def _pallas_bf3_mel_frames(
    frames: jnp.ndarray,  # [N, k_pad] float32 RAW (unwindowed) frames
    mt, *slice_mats,
    interpret: bool,
    ks: int,
    km: int,
    cutoff: int,
    tile_frames: int,
    mel_precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    n, k_pad = frames.shape
    n_bins_pad, n_mels_pad = mt.shape
    assert n % tile_frames == 0
    n_tiles = n // tile_frames

    kernel = functools.partial(
        _bf3_mel_tile_kernel, ks=ks, km=km, cutoff=cutoff,
        n_bins_pad=n_bins_pad, mel_precision=mel_precision,
    )
    total_cols = sum(m.shape[1] for m in slice_mats)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_frames, k_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mt
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(slice_mats),
        out_specs=pl.BlockSpec((tile_frames, n_mels_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n_mels_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * k_pad * total_cols
            + 2 * n * n_bins_pad * n_mels_pad,
            bytes_accessed=(n * k_pad + n * n_mels_pad) * 4,
            transcendentals=n * n_mels_pad,
        ),
        interpret=interpret,
    )(frames, mt, *slice_mats)


# --------------------------------------------------------------------------
# "sig" kernel: the flagship — bf3 numerics + IN-KERNEL FRAMING.
#
# Every other path (XLA or Pallas) pays for the overlapping frames tensor:
# either XLA materializes [total_frames, fft] (3.2x the signal, and the
# strided-slice relayouts behind it measure 5-8 ms at 256x10s), or the MXU
# eats zero-padding. Here the kernel reads the RAW SIGNAL (13x less HBM
# traffic), DMAs each tile's 65 x 640-sample macro-row window into VMEM,
# and assembles the 256 overlapping frames with four lane-rolls:
#
#   frame k = 4j+g starts at sample 160k = 640j + 160g, so for each phase
#   g the 64 frames live at a FIXED lane offset 160g inside macro-row pair
#   [j, j+1] — one pltpu.roll + slice per phase. Garbage lanes past sample
#   400 are killed by the zero rows of the DFT matrix, so no masking.
#
# The bf3 pair sum is folded into the MXU: signal slices are concatenated
# along K ([x0|x0|x0|x1|x1|x2], K = 6*512) against stacked matrix planes
# ([M0;M1;M2;M0;M1;M0]), so the dot's native f32 accumulator performs the
# entire 6-pass pair summation — no per-pair extraction or VPU adds, and
# the only matmul output is [tile, 512] (re|im).
#
# Output rows are phase-major within each tile; `whisper_mel_pallas`
# reindexes with a cheap XLA reshape/transpose on [*, n_mels].
# --------------------------------------------------------------------------

_SIG_ROW = 640            # whisper default macro-row: lcm(hop=160, lanes=128)
_SIG_FRAMES_PER_TILE = 512
_SIG_ROWS_PER_TILE = 128  # 512 frames * 160 hop / 640 (measured-best, v5e)


def sig_geometry(fft_size: int, hop_size: int, offset: int = 0):
    """Macro-row geometry for the signal-input kernel, or ``None`` when
    the config cannot ride it.

    A macro-row is ``row_w`` samples — a common multiple of ``hop`` (so a
    whole number of frames starts in every row) and of the 128-lane vreg
    width (so the signal reshapes zero-copy and rolls stay lane-aligned).
    Every frame must fit the rolled two-row window:
    ``(phases-1)*hop + k_pad + offset <= 2*row_w``, i.e.
    ``k_pad + offset <= row_w + hop``. Returns
    ``(row_w, phases, rows_tile)`` with ``rows_tile`` a multiple of the
    8-row DMA granule targeting ~512 frames per tile (measured-best)."""
    import math

    if hop_size < 8:
        return None
    k_pad = -(-fft_size // LANES) * LANES
    base = hop_size * LANES // math.gcd(hop_size, LANES)
    row_w = base
    while row_w + hop_size < k_pad + offset:
        row_w += base
    if row_w > 4096:  # scratch pair [rows+8, row_w] must stay VMEM-sane
        return None
    phases = row_w // hop_size
    rows_tile = max(8, ((512 // phases) // 8) * 8)
    # double-buffered scratch is 2*(rows+8)*row_w f32: shrink the tile
    # until it fits a sane VMEM slice (large-hop configs with phases==1)
    while rows_tile > 8 and 2 * (rows_tile + 8) * row_w * 4 > (4 << 20):
        rows_tile -= 8
    return row_w, phases, rows_tile


def sig_packed_im_bins(fft_size: int, n_bins: int) -> list:
    """Bins whose imaginary DFT column is not identically zero: every bin
    except DC and (for even fft sizes) Nyquist. These are the only sin
    columns the N-packed layout has to carry."""
    return [j for j in range(1, n_bins) if 2 * j != fft_size]


def _sig_frontend_matrices(fft_size: int, n_bins: int, window: np.ndarray,
                           filters: np.ndarray, ks: int, km: int,
                           cutoff: int, pack: int | None = None,
                           pack_off: int = 0, npack: str | bool = "auto",
                           preproc: np.ndarray | None = None):
    """General builder for the signal-input kernel's device matrices:
    K-stacked bf16 plane matrix with the given ``window`` folded in, the
    pair order for the matching signal-slice concatenation, and the
    matching projection from ``filters [n_mels, >= n_bins]``. Any
    frontend whose spectral stage is windowed-rDFT -> power -> filterbank
    fits (whisper mel, NeMo log-mel, Kaldi fbank).

    Two column layouts (``npack``, "auto" picks the narrower stack):

    - SPLIT (``npack=False``): ``m_big [K_tot, 2*n_bins_pad]`` with re in
      cols [0, n_bins_pad), im in [n_bins_pad, 2*n_bins_pad); the kernel
      computes ``re*re + im*im`` on the VPU and projects with
      ``mt [n_bins_pad, n_mels_pad]``.
    - N-PACKED (``npack=True``): re columns for every bin, then im columns
      ONLY for bins whose sin column is nonzero (DC and Nyquist have
      im == 0 exactly) — ``m_big [K_tot, n_cols_pad]``. The kernel squares
      ``y`` elementwise and the re/im ADD rides the projection matmul:
      ``mt [n_cols_pad, n_mels_pad]`` carries the filter row once for the
      re column and once for the im column of each bin, so
      ``(y*y) @ mt == sum_bins (re^2 + im^2) * filter`` exactly (same
      products, MXU-accumulator adds). For 512-point heads (257 bins)
      this is 512 columns instead of 768 — one third less MXU work in the
      dominant dot and no power add/slice on the VPU; for whisper's
      400-point head both layouts pad to 512 and split's cheaper
      projection (K = n_bins_pad, not n_cols_pad) wins, which is exactly
      what "auto" decides.

    ``window`` may be shorter than ``fft_size`` (a zero-padded frame,
    e.g. Kaldi's 400-in-512); ``preproc`` optionally left-folds an
    arbitrary per-frame LINEAR preprocessing matrix ``[taps, taps]``
    (rows become ``preproc.T @ (window * dft_rows)`` — Kaldi's
    DC-removal + preemphasis fold exactly this way).

    Returns ``(m_big, pair_i, mt, n_bins_pad, n_mels_pad, k_pad, npack)``
    where ``n_bins_pad`` is the kernel's split point (0 when packed)."""
    n_mels = filters.shape[0]
    n_bins_pad = -(-n_bins // LANES) * LANES
    n_mels_pad = -(-n_mels // LANES) * LANES
    k_pad = -(-fft_size // LANES) * LANES

    im_bins = sig_packed_im_bins(fft_size, n_bins)
    n_cols_pad = -(-(n_bins + len(im_bins)) // LANES) * LANES
    if npack == "auto":
        npack = n_cols_pad < 2 * n_bins_pad

    cos_m, msin_m = dft.rdft_matrices(fft_size, n_bins)
    w = np.asarray(window, np.float64)[:, None]
    taps = w.shape[0]
    if pack_off and taps < fft_size:
        # a short window writes rows [0, taps) while pack_off slices
        # rows [pack_off, pack_off+pack) — the combination would drop
        # real rows silently. Callers with an offset interior (NeMo's
        # centered frames) must pass the full fft_size-length window
        # with its zero flanks explicit.
        raise ValueError(
            "pack_off > 0 requires a full fft_size-length window"
        )
    cwf = w * cos_m[:taps]  # [taps, n_bins] float64, window folded
    swf = w * msin_m[:taps]
    if preproc is not None:
        pre_t = np.asarray(preproc, np.float64).T
        cwf = pre_t @ cwf
        swf = pre_t @ swf
        # a RECTANGULAR preproc ([taps, taps_src]) widens the frame to
        # taps_src raw samples — e.g. NeMo's cross-frame preemphasis
        # y[t] = x[t] - 0.97*x[t-1] makes a 512-tap centered frame a
        # 513-tap function of the raw signal. The spectral rows now
        # index RAW window positions.
        taps = cwf.shape[0]
        k_pad = max(k_pad, -(-taps // LANES) * LANES)
    filt = np.asarray(filters, np.float64)[:, :n_bins].T  # [n_bins, n_mels]
    if npack:
        csw = np.zeros((k_pad, n_cols_pad))
        csw[:taps, :n_bins] = cwf
        csw[:taps, n_bins : n_bins + len(im_bins)] = swf[:, im_bins]
        mt = np.zeros((n_cols_pad, n_mels_pad))
        mt[:n_bins, :n_mels] = filt
        mt[n_bins : n_bins + len(im_bins), :n_mels] = filt[im_bins]
    else:
        csw = np.zeros((k_pad, 2 * n_bins_pad))
        csw[:taps, :n_bins] = cwf
        csw[:taps, n_bins_pad : n_bins_pad + n_bins] = swf
        mt = np.zeros((n_bins_pad, n_mels_pad))
        mt[:n_bins, :n_mels] = filt
    m_big, pair_i = _sig_stack_combined(
        csw, ks, km, cutoff,
        pack=fft_size if pack is None else pack, pack_off=pack_off,
    )
    return (m_big, pair_i, mt, 0 if npack else n_bins_pad, n_mels_pad,
            k_pad, npack)


def _sig_stack_planes(cw: np.ndarray, sw: np.ndarray, ks: int, km: int,
                      cutoff: int, pack: int | None = None,
                      pack_off: int = 0):
    """Split-layout convenience wrapper over ``_sig_stack_combined``:
    column-concatenates the (already padded, [k_pad, n_bins_pad] float64)
    re/im spectral matrices. bf16 rounding is elementwise, so slicing the
    combined matrix equals slicing the halves separately."""
    return _sig_stack_combined(np.concatenate([cw, sw], axis=1), ks, km,
                               cutoff, pack=pack, pack_off=pack_off)


@_host_built
def _sig_stack_combined(csw: np.ndarray, ks: int, km: int,
                        cutoff: int, pack: int | None = None,
                        pack_off: int = 0):
    """Slice the combined (column-layout-agnostic, [k_pad, width] float64)
    spectral matrix into rounded-bf16 planes and K-stack the kept pairs;
    returns ``(m_big bf16 [K_tot, width], pair_i)``. Any per-frame LINEAR
    preprocessing (window, DC removal, preemphasis) can be pre-folded
    into ``csw`` by the caller.

    ``pack`` (the frame's REAL tap count, e.g. fft_size) packs the K
    blocks tightly: each block keeps only its ``pack`` real rows (the
    rest of ``csw`` is zero by construction, so this drops exact
    zeros — no numerics change), and the stack is lane-padded once at
    the end. For whisper's 400-tap frame that is K = 2432 instead of
    6*512 = 3072 — measured 14% faster end-to-end: the MXU stops
    multiplying padding (VERDICT r2 item 2)."""
    k_rows = csw.shape[0] if pack is None else pack
    k_lo = pack_off if pack is not None else 0
    planes = _bf16_round_slices(csw, km)
    pair_i = []  # signal-slice index per K block, i-major
    blocks = []
    for i in range(ks):
        for j in range(min(cutoff - i, km - 1) + 1):
            pair_i.append(i)
            blocks.append(
                np.asarray(planes[j], np.float32)[k_lo:k_lo + k_rows]
            )
    stack = np.concatenate(blocks, axis=0)
    k_tot = -(-stack.shape[0] // LANES) * LANES
    if k_tot != stack.shape[0]:
        stack = np.pad(stack, ((0, k_tot - stack.shape[0]), (0, 0)))
    m_big = jnp.asarray(stack, jnp.bfloat16)
    return m_big, tuple(pair_i)


@_host_built
def bf2_stack(mt) -> jnp.ndarray:
    """2-slice rounded-bf16 K-stack [F0; F1; F0] of a filter projection,
    pairing with the kernel's power slices [p0 | p0 | p1] (see
    ``_sig_project``'s bf2 mode). Host-built: callers cache the result."""
    f0, f1 = _bf16_round_slices(np.asarray(mt, np.float64), 2)
    return jnp.asarray(
        np.concatenate([np.asarray(f0, np.float32),
                        np.asarray(f1, np.float32),
                        np.asarray(f0, np.float32)], axis=0),
        jnp.bfloat16,
    )


@functools.lru_cache(maxsize=8)
@_host_built
def _sig_device_matrices(fft_size: int, n_mels: int, sampling_rate: float,
                         ks: int, km: int, cutoff: int):
    """Whisper-mel instantiation of ``_sig_frontend_matrices`` (projection
    zeroes bins >= fft/2 like ``src/mel.rs:148-168``), plus the bf2 mel
    variant."""
    half = fft_size // 2
    filters = mel_filterbank(sampling_rate, fft_size, n_mels)
    m_big, pair_i, mt, n_bins_pad, n_mels_pad, k_pad, npack = \
        _sig_frontend_matrices(fft_size, half, hann_periodic(fft_size),
                               filters, ks, km, cutoff)
    mt_bf2 = bf2_stack(mt)
    return (m_big, pair_i, jnp.asarray(mt, jnp.float32), mt_bf2,
            n_bins_pad, n_mels_pad, k_pad, npack)


def _sig_window_frames(sig_ref, tailpad_ref, s_scratch, dma_sems,
                       tail_sems, *, rows: int, tail_rows: int,
                       row_w: int, phases: int, k_pad: int, offset: int):
    """Shared prologue of every signal-input kernel: double-buffered
    macro-row window DMA (with the clamped zero-copy tail protocol) plus
    the lane-roll frame assembly. Returns the phase-major frame tile
    ``[phases*rows, k_pad]`` float32."""
    b = pl.program_id(0)
    t = pl.program_id(1)
    n_b = pl.num_programs(0)
    n_t = pl.num_programs(1)
    slot = (b * n_t + t) % 2
    full = rows + 8
    # zero-copy input mode (tail_rows < full): the clip's macro-rows end
    # mid-tile. Mosaic DMAs need 8-aligned row starts AND sizes, so the
    # last tile fetches the aligned prefix from sig and the ragged
    # remainder (< 8 rows, pre-padded on host) from tailpad_ref.
    rem8 = (tail_rows // 8) * 8
    ragged = tail_rows - rem8  # 0..7 real rows living in tailpad_ref
    fetched = rem8 + (8 if ragged else 0)

    def dma_full(bb, tt, sl):
        # sig is [b, rows_per_clip, 640]: the clip index rides dim 0 so
        # every row-dim slice starts at tt*rows — provably 8-aligned
        # regardless of rows_per_clip
        return pltpu.make_async_copy(
            sig_ref.at[bb, pl.ds(tt * rows, full), :],
            s_scratch.at[sl], dma_sems.at[sl],
        )

    def dma_tail_main(bb, sl):
        return pltpu.make_async_copy(
            sig_ref.at[bb, pl.ds((n_t - 1) * rows, rem8), :],
            s_scratch.at[sl, pl.ds(0, rem8)], dma_sems.at[sl],
        )

    def dma_tail_pad(bb, sl):
        return pltpu.make_async_copy(
            tailpad_ref.at[bb],
            s_scratch.at[sl, pl.ds(rem8, 8)], tail_sems.at[sl],
        )

    def dma_op(bb, tt, sl, start):
        op = (lambda d: d.start()) if start else (lambda d: d.wait())

        def tail(bb_, sl_):
            op(dma_tail_main(bb_, sl_))
            if ragged:
                op(dma_tail_pad(bb_, sl_))

        if tail_rows == full:
            op(dma_full(bb, tt, sl))
            return
        if n_t == 1:
            # every tile is a tail tile; the full-window slice may not
            # even fit the operand, so it must not be traced at all
            tail(bb, sl)
            return
        if isinstance(tt, int):  # static tile index (the warm-up start)
            tail(bb, sl) if tt == n_t - 1 else op(dma_full(bb, tt, sl))
            return

        @pl.when(tt < n_t - 1)
        def _():
            op(dma_full(bb, tt, sl))

        @pl.when(tt == n_t - 1)
        def _():
            tail(bb, sl)

    # double-buffered window DMA: tile (b, t) waits on its own slot and
    # prefetches the next tile's window into the other one
    @pl.when((b == 0) & (t == 0))
    def _():
        dma_op(0, 0, 0, start=True)

    nxt = b * n_t + t + 1
    nb, nt = nxt // n_t, nxt % n_t

    @pl.when(nxt < n_b * n_t)
    def _():
        dma_op(nb, nt, (slot + 1) % 2, start=True)

    dma_op(b, t, slot, start=False)
    if tail_rows < full and fetched < full:
        # rows past the clip end were not fetched; zero them so stale or
        # uninitialized VMEM (possibly NaN) cannot reach the dot even in
        # the zero-matrix-row positions (0 * NaN would poison real frames).
        # Done as a predicated STORE into the scratch rather than a
        # jnp.where over the whole window: the where ran on every tile
        # (~350 KB of select per tile); this store runs only on the tail
        # tile and touches only the stale rows. Non-tail reuses of the
        # slot are safe — their full-window DMA overwrites every row.
        @pl.when(t == n_t - 1)
        def _():
            s_scratch[slot, fetched:full, :] = jnp.zeros(
                (full - fetched, s_scratch.shape[-1]), s_scratch.dtype
            )

    s = s_scratch[slot]  # [rows + 8, 640]

    # lo = macro-rows r, hi = rows r+1: the one-row shift comes from a
    # sublane roll of the DMA'd window (DMA slices are 8-row granular, so
    # a +1-row source view cannot be fetched directly)
    lo = s[:rows]
    hi = pltpu.roll(s, shift=rows + 8 - 1, axis=0)[:rows]
    pair = jnp.concatenate([lo, hi], axis=1)  # [rows, 2*row_w]
    hop_g = row_w // phases  # the hop size
    width = 2 * row_w
    return jnp.concatenate(
        [pltpu.roll(pair,
                    shift=(width - hop_g * g - offset) % width,
                    axis=1)[:, :k_pad]
         for g in range(phases)],
        axis=0,
    )  # [phases*rows, k_pad], phase-major rows (pltpu.roll matches
       # np.roll: a positive shift of width-d left-rotates by d)


def _sig_flat_geometry(hop_size: int, k_pad: int, offset: int,
                       b: int, t: int, target_rows: int = 512,
                       epilogue: bool = False):
    """Geometry for the FLAT-input framing path (batch-on-sublanes), or
    ``None`` when the call cannot ride it.

    The rows-mode kernels take the signal as host-prepped macro-rows
    ``[B, R, row_w]`` — but that reshape from the caller's ``[B, T]`` is
    a real whole-input relayout under XLA's (8, 128) tiling (profiler:
    0.178 ms/call at 64x10 s, ~5%% of the 256x300 s headline — reshape.8,
    a 41 MB copy). Flat mode instead DMAs ``(8 clips, span)`` windows
    straight out of the UNTOUCHED ``[B, T]`` operand: with the batch dim
    8-aligned and spans 128-aligned, every window is a run of whole
    (8, 128) tiles — fully contiguous HBM reads, no host prep at all.
    Frames then assemble from ``n_classes`` static lane-shifted views
    (one per frame-phase class mod the 128-lane grid) instead of
    macro-row rolls.

    Returns ``(pos_tile, n_classes, stride, fetch_w)``:
    ``pos_tile`` frames per clip per tile (the MXU tile is
    ``8 * pos_tile`` rows), ``n_classes = lcm(hop, 128) / hop`` phase
    classes, ``stride = n_classes * hop`` (the lane-aligned frame
    stride), ``fetch_w`` the 128-aligned per-tile DMA width."""
    import math

    if hop_size < 8 or b % 8 or t % LANES or offset < 0:
        return None
    # target_rows (MXU rows per tile) is an explicit argument only —
    # 512 measured-best for the plain kernel (see docs/ROADMAP.md);
    # tools/flat_rows_ab.py passes ablation sizes via flat_rows=.
    # frames start at p*hop + offset (matching _sig_window_frames' roll
    # convention); fetches start at the 128-aligned floor and the m0
    # remainder becomes a constant extra lane shift in the assembly
    m0 = offset - (offset // LANES) * LANES
    stride = hop_size * LANES // math.gcd(hop_size, LANES)
    n_classes = stride // hop_size
    if epilogue:
        # fused VAD / quant epilogues emit [.., 8, frames_tile]-shaped
        # side outputs whose LANE dim is the tile's frame count — Mosaic
        # requires it divisible by 128, so the tile grows to 128 frames
        # per clip (1024 MXU rows) and configs that cannot reach a
        # 128-multiple fall back to rows mode
        target_rows = max(target_rows, 1024)
        step = (LANES * n_classes) // math.gcd(LANES, n_classes)
    else:
        step = n_classes
    def _fw(pt):
        return -(-(m0 + (pt - 1) * hop_size + k_pad) // LANES) * LANES

    pos_tile = max(step, ((target_rows // 8) // step) * step)
    while pos_tile > step and 2 * 8 * _fw(pos_tile) * 4 > (4 << 20):
        pos_tile -= step
    fetch_w = _fw(pos_tile)
    if (2 * 8 * fetch_w * 4 > (4 << 20)
            or (epilogue and pos_tile % LANES)):
        return None
    return pos_tile, n_classes, stride, fetch_w


def _pad_for_flat(x, hop_size: int, k_pad: int, offset: int,
                  epilogue: bool, flat_rows: int = 512):
    """Zero-pad ``[B, T]`` into FLAT-framing eligibility (``B % 8 == 0``,
    ``T % 128 == 0`` — see ``_sig_flat_geometry``) when the padded call
    would ride the flat path; otherwise return the input untouched.

    Callers slice outputs back to the real batch: padded clips are all
    zeros, and padded tail samples either sit beyond every real frame's
    window or read as the same zeros the kernel's clamped tail DMA would
    have synthesized. This closes the eligibility cliff where e.g. a
    B=5 caller silently fell back to the (slower) rows mode — the pad is
    one bounded XLA copy, cheaper than the rows path's whole-input
    macro-row relayout it replaces."""
    b, t = x.shape
    pb, pt = -b % 8, -t % LANES
    if not (pb or pt):
        return x
    if _sig_flat_geometry(hop_size, k_pad, offset, b + pb, t + pt,
                          target_rows=flat_rows,
                          epilogue=epilogue) is None:
        return x
    return jnp.pad(x, ((0, pb), (0, pt)))


def sig_effective_frames_tile(fft_size: int, hop_size: int, offset: int,
                              b: int, t: int, phases: int,
                              rows_tile: int,
                              epilogue: bool = True,
                              flat_rows: int = 512) -> int:
    """Frames per clip per kernel tile for the given call shape — the
    stride at which the fused-VAD epilogue's counts go stale (its 3x3
    Sobel patch crosses a tile boundary) and the host fix-up must
    recompute columns. Matches ``_pallas_sig_mel``'s input-mode choice:
    the flat path tiles by ``pos_tile`` frames per clip, the rows path
    by ``phases * rows_tile``."""
    k_pad = -(-fft_size // LANES) * LANES
    flat = _sig_flat_geometry(hop_size, k_pad, offset, b, t,
                              target_rows=flat_rows, epilogue=epilogue)
    return flat[0] if flat is not None else phases * rows_tile


def _sig_window_frames_flat(sig_ref, s_scratch, dma_sems, *,
                            pos_tile: int, hop: int, k_pad: int,
                            offset: int, stride: int, n_classes: int,
                            fetch_w: int):
    """FLAT-input prologue: double-buffered ``(8, fetch_w)`` window DMA
    straight from the ``[B, T]`` signal (see ``_sig_flat_geometry``) plus
    the phase-class frame assembly. Returns ``[8 * pos_tile, k_pad]``
    float32 frames, row ``p * 8 + c`` = frame ``tile_base + p`` of clip
    ``group_base + c`` (position-major; ``_sig_natural_order_flat``
    restores clip-major order at the store)."""
    bg = pl.program_id(0)
    tt = pl.program_id(1)
    n_bg = pl.num_programs(0)
    n_t = pl.num_programs(1)
    slot = (bg * n_t + tt) % 2
    t_total = sig_ref.shape[1]
    span = pos_tile * hop
    # frame p covers [p*hop + offset, p*hop + offset + k_pad) — the
    # rows path's roll convention. Fetches start at the 128-aligned
    # floor; the m0 remainder rides the phase-class shifts below.
    off_floor = (offset // 128) * 128
    m0 = offset - off_floor
    # first tile whose full window would read past the clip end —
    # usually n_t - 1, in principle the rounding slack can spill one
    # tile earlier; the last tile is always treated as clamped (its
    # zero-fill below)
    first_over = max(0, n_t - 1)
    while (first_over > 0
           and (first_over - 1) * span + off_floor + fetch_w > t_total):
        first_over -= 1

    def dma(bb, ttt, sl, start):
        # every branch has STATIC slice sizes; the clamps depend only on
        # which tile this is. t0 = ttt*span + off_floor is 128-aligned
        # by construction (span % 128 == 0).
        op = (lambda d: d.start()) if start else (lambda d: d.wait())

        def issue(ttt_static):
            t0 = ttt_static * span + off_floor
            w = min(fetch_w, t_total - t0)
            if w <= 0:
                return  # nothing to fetch; the zero-fill covers it all
            op(pltpu.make_async_copy(
                sig_ref.at[pl.ds(bb * 8, 8), pl.ds(t0, w)],
                s_scratch.at[sl, :, pl.ds(0, w)], dma_sems.at[sl],
            ))

        if isinstance(ttt, int):
            issue(ttt)
            return
        if n_t == 1:
            issue(0)
            return
        # trailing tiles (>= first_over) need per-tile STATIC clamps
        for st in range(first_over, n_t):
            @pl.when(ttt == st)
            def _(st=st):
                issue(st)
        if first_over > 0:
            @pl.when(ttt < first_over)
            def _():
                # leading tiles: full window, in bounds by construction
                op(pltpu.make_async_copy(
                    sig_ref.at[pl.ds(bb * 8, 8),
                               pl.ds(ttt * span + off_floor, fetch_w)],
                    s_scratch.at[sl], dma_sems.at[sl],
                ))

    @pl.when((bg == 0) & (tt == 0))
    def _():
        dma(0, 0, 0, start=True)

    nxt = bg * n_t + tt + 1
    nb, nt = nxt // n_t, nxt % n_t

    @pl.when(nxt < n_bg * n_t)
    def _():
        dma(nb, nt, (slot + 1) % 2, start=True)

    dma(bg, tt, slot, start=False)

    # zero the unfetched tail of every clamped trailing tile so stale
    # VMEM (possibly NaN) cannot poison the dot. Predicated stores —
    # leading tiles' full-window DMA overwrites every lane.
    for st in range(first_over, n_t) if n_t > 1 else [0]:
        fill_end = max(0, min(fetch_w, t_total - (st * span + off_floor)))
        if fill_end < fetch_w:
            @pl.when(tt == st)
            def _(fill_end=fill_end):
                s_scratch[slot, :, fill_end:] = jnp.zeros(
                    (8, fetch_w - fill_end), s_scratch.dtype)

    s = s_scratch[slot]  # [8, fetch_w]
    n_q = pos_tile // n_classes
    w_g = (n_q - 1) * stride + k_pad
    # one materialized lane-rotate per phase class (pltpu.roll: positive
    # shift of width-d left-rotates by d — wrapped lanes land past w_g,
    # never read); every frame in the class is then a lane-ALIGNED
    # (stride % 128 == 0) subview of its class vector, so the concat
    # sees uniform layouts (Mosaic rejects mixed lane-offset concats).
    # The m0 margin (non-aligned offsets) rides each class's shift.
    shifted = [
        (s if m0 + g * hop == 0
         else pltpu.roll(s, shift=(fetch_w - m0 - g * hop) % fetch_w,
                         axis=1))[:, :w_g]
        for g in range(n_classes)
    ]
    return jnp.concatenate(
        [shifted[p % n_classes][:, (p // n_classes) * stride :
                                (p // n_classes) * stride + k_pad]
         for p in range(pos_tile)],
        axis=0,
    )  # [8*pos_tile, k_pad]


def _sig_natural_order_flat(vals, pos_tile: int):
    """Flat-mode store order: position-major rows ``p * 8 + c`` ->
    ``[8 clips, pos_tile frames, m]`` (the out block's shape) via one
    VMEM sublane permute — the flat-path analogue of
    ``_sig_natural_order``."""
    m = vals.shape[-1]
    return vals.reshape(pos_tile, 8, m).transpose(1, 0, 2)


def _sig_slices(frames, ks: int) -> list:
    """The bf16 residual cascade of the frame tile: slice i is the bf16
    rounding of what slices < i left behind. Shared by every head of a
    multi-head kernel — the cascade depends only on the signal."""
    residual = frames
    x_slices = []
    for i in range(ks):
        xs = residual.astype(jnp.bfloat16)
        if i + 1 < ks:
            residual = residual - xs.astype(jnp.float32)
        x_slices.append(xs)
    return x_slices


def _sig_xcat_from(x_slices, pair_i, pack: int, k_tot: int,
                   pack_off: int = 0,
                   blocks: tuple | None = None) -> jnp.ndarray:
    """Concatenate the given signal slices along K in pair order (each
    block packed to its ``pack`` real taps, the whole lane-padded to
    ``k_tot``). ``blocks`` optionally keeps a SUBSET of the K blocks —
    the reduced-accuracy head trick: a head whose parity gate is coarse
    (Kaldi's 0.0152 golden bound) can contract over the low-order
    slice-pair blocks only, at ~2^-16 relative signal error, for
    proportionally less MXU work."""
    pair = (pair_i if blocks is None
            else tuple(pair_i[b] for b in blocks))
    parts = [x_slices[i][:, pack_off : pack_off + pack] for i in pair]
    tail = k_tot - pack * len(pair)
    if tail:
        parts.append(jnp.zeros((x_slices[0].shape[0], tail),
                               jnp.bfloat16))
    return jnp.concatenate(parts, axis=1)


def _sig_xcat(frames, ks: int, pair_i, pack: int,
              k_tot: int, pack_off: int = 0) -> jnp.ndarray:
    """bf3 signal slices, concatenated along K in pair order, each block
    packed to its ``pack`` real taps (matching ``_sig_stack_planes``) and
    the whole lane-padded to ``k_tot``. The misaligned-lane concat costs
    less than the 20% of MXU passes it saves."""
    return _sig_xcat_from(_sig_slices(frames, ks), pair_i, pack, k_tot,
                          pack_off)


def _sig_project(power, mt_ref, mel_precision):
    if mel_precision == "bf2":
        # 2-slice bf16 K-concat mel projection: pairs (0,0),(0,1),(1,0)
        # accumulate in the MXU's f32 accumulator (3 bf16 passes vs
        # HIGHEST's 6; both power and filters are nonnegative, so the
        # relative error stays ~2^-16 -> ~1.7e-6 in normalized units)
        p0 = power.astype(jnp.bfloat16)
        p1 = (power - p0.astype(jnp.float32)).astype(jnp.bfloat16)
        pcat = jnp.concatenate([p0, p0, p1], axis=1)
        return jnp.dot(pcat, mt_ref[:], preferred_element_type=jnp.float32)
    return jnp.dot(power, mt_ref[:], preferred_element_type=jnp.float32,
                   precision=mel_precision)


def _sig_out_vals(energy, out_mode: str, guard: float,
                  want_max: bool = False):
    """Energy -> output values for the configured head. With
    ``want_max=True`` returns ``(vals, vmax)`` where ``vmax [frames, 1]``
    is each frame's max over vals, BIT-EXACT with
    ``jnp.max(vals, axis=1)`` but free for the whisper head: the whisper
    norm already reduces ``max(log_mel)`` per frame for its -8 dB clamp,
    and the max element's own transform is ``(raw + 4) * 0.25`` — the
    identical f32 expression — so the quant epilogue's second lane
    reduction (VERDICT r3 item 3) disappears. Pad lanes can't poison the
    reuse: padded mt columns give energy 0 -> log10(LOG10_FLOOR), the
    floor every REAL lane's log is >= of. Non-whisper heads return
    ``vmax=None`` (ln_accurate is not certified bit-monotone; callers
    fall back to a real reduction)."""
    if out_mode == "ln_guard":
        # NeMo-style output: ln(energy + guard), no whisper norm
        # (src/mel.rs:321-385 semantics). energy >= 0 by construction
        # (squares times nonnegative filters), so the argument >= guard.
        from melspec_tpu.ops.fastmath import ln_accurate

        # guard clamped to the smallest NORMAL f32: ln_accurate's bit
        # decomposition is documented normal-only, and a subnormal guard
        # with silent input would otherwise produce a wrong log silently
        vals = ln_accurate(energy + max(guard, 1.1754944e-38))
    elif out_mode == "ln_floor":
        # Kaldi fbank output: ln(max(energy, floor))
        # (src/fbank.rs:205-221 semantics); guard carries the floor.
        from melspec_tpu.ops.fastmath import ln_accurate

        vals = ln_accurate(
            jnp.maximum(energy, max(guard, 1.1754944e-38))
        )
    else:
        log_mel = log10_accurate(jnp.maximum(energy, LOG10_FLOOR))
        raw = jnp.max(log_mel, axis=1, keepdims=True)
        vals = (jnp.maximum(log_mel, raw - 8.0) + 4.0) * 0.25
        if want_max:
            return vals, (raw + 4.0) * 0.25
    return (vals, None) if want_max else vals


def _sig_natural_order(vals, phases: int, rows: int):
    """Phase-major rows -> NATURAL frame order inside VMEM (row g*rows+j
    is frame phases*j + g): a sublane permute here replaces what used to
    be a whole-output XLA reshape/transpose round trip through HBM —
    the big-batch regression's main intermediate (VERDICT r2 item 1)."""
    m = vals.shape[-1]
    if phases > 1:
        vals = vals.reshape(phases, rows, m).transpose(1, 0, 2)
        vals = vals.reshape(rows * phases, m)
    return vals


def _sig_quant_vals(vals, n_mels_real: int, vmax=None,
                    qabl: str = ""):
    """Fused per-frame 8-bit quantization epilogue: each frame's min/max
    range plus Rust-``round()`` tie-breaking, bit-exact with the
    expression tree of ``ops.quant.quantize_frames_jnp`` (which itself is
    bit-exact with the reference's per-column quantizer,
    ``src/wasm.rs:95-145`` / ``src/quant.rs:140-165``). Computing it here
    means the wire-record payload (``u8[n_mels] | min | max``) leaves the
    kernel directly — the float mel never round-trips HBM for a separate
    quant pass. Returns ``(q [frames, n_mels_real] int32 in [0, 255],
    rng [frames, 2] f32: lo | hi)``.

    VPU budget (VERDICT r3 item 3 — this epilogue used to cost 2-4x the
    kernel it wraps): ``vmax`` reuses the whisper head's existing lane
    max (see ``_sig_out_vals(want_max=True)``), leaving ONE lane
    reduction; the host quantizer's floor / frac>=0.5 / isnan / f32-clip
    chain collapses to an integer halving — for ``scaled = k + f >= 0``,
    ``trunc(2*scaled) = 2k + (f >= 0.5)`` (the *2 is an exact exponent
    bump, the f32 sub ``scaled - floor`` the host compares is exact by
    Sterbenz), so ``(trunc(2*scaled) + 1) >> 1 = k + (f >= 0.5)`` —
    the identical half-up integer. Degenerate range (hi == lo): the
    host's ``0*inf = NaN -> 0``; here NaN converts to 0 (TPU) or INT_MIN
    (some CPU lowerings) and the [0, 511] clamp pins both to q = 0, and
    ``v > lo`` with a denormal range gives inf -> INT_MAX -> 511 ->
    q = 255, matching the host's f32 clip."""
    if qabl == "oldmath":
        v = vals[:, :n_mels_real]
        lo = jnp.min(v, axis=1, keepdims=True)
        hi = jnp.max(v, axis=1, keepdims=True)
        scale = 255.0 / (hi - lo)
        scaled = (v - lo) * scale
        fl = jnp.floor(scaled)
        rounded = fl + (scaled - fl >= 0.5).astype(jnp.float32)
        rounded = jnp.where(jnp.isnan(rounded), 0.0, rounded)
        return jnp.clip(rounded, 0.0, 255.0).astype(jnp.int32), \
            jnp.concatenate([lo, hi], axis=1)
    if qabl in ("tree", "noreduce", "narrowrng", "fullrng"):
        # ablation: all-lanes rotate-min/max butterfly keeping every
        # intermediate full-width. Measured on DEVICE TIME: the 28
        # roll/min/max ops cost MORE than Mosaic's native narrow
        # reductions (1.448 vs 1.267 ms noreduce / 1.307 oldmath), so
        # the default below uses jnp.min/max
        nl = vals.shape[1]
        assert nl & (nl - 1) == 0, "lane count must be a power of two"
        lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        masked = lane < n_mels_real
        lo = jnp.where(masked, vals, jnp.inf)
        hi = jnp.where(masked, vals, -jnp.inf)
        sh = 1
        while sh < nl:
            lo = jnp.minimum(lo, pltpu.roll(lo, sh, 1))
            hi = jnp.maximum(hi, pltpu.roll(hi, sh, 1))
            sh *= 2
        if qabl == "noreduce":
            lo, hi = vals - 2.0, vals
        scale = 255.0 / (hi - lo)
        scaled = (vals - lo) * scale
        y = jnp.clip((scaled * 2.0).astype(jnp.int32), 0, 511)
        q = jnp.minimum((y + 1) >> 1, 255)
        if qabl == "narrowrng":
            return q, jnp.concatenate([lo[:, :1], hi[:, :1]], axis=1)
        if qabl == "fullrng":
            return q, jnp.where(lane == 0, lo, hi)
        return q, _sig_rng_record(lo[:, :1], hi[:, :1])
    # DEFAULT: Mosaic-native narrow lane reductions (device-measured
    # cheaper than any manual tree) + the integer tie-break + the
    # frames-on-lanes rng record (measured free — same layout as the
    # fused-VAD counts output). With ``vmax`` the whisper head's
    # existing lane max substitutes for the hi reduction.
    v = vals[:, :n_mels_real]
    lo = jnp.min(v, axis=1, keepdims=True)
    hi = jnp.max(v, axis=1, keepdims=True) if vmax is None else vmax
    scale = 255.0 / (hi - lo)
    scaled = (v - lo) * scale
    y = jnp.clip((scaled * 2.0).astype(jnp.int32), 0, 511)
    q = jnp.minimum((y + 1) >> 1, 255)
    return q, _sig_rng_record(lo, hi)


def _sig_rng_record(lo_col, hi_col):
    """The quant epilogue's per-frame range output, frames on LANES in
    an ``[8, frames_tile]`` block (row 0 = lo, row 1 = hi, rows 2-7
    redundant — Mosaic wants >= 8-row out sublane dims). This is the
    fused-VAD counts layout, the one second-output shape measured to
    cost ~nothing; a frames-on-sublanes ``[frames, 2]`` store measured
    ~4%% of the kernel (device time), and wall-clock noise once
    magnified that into the round-3 "quant costs 2-4x" verdict."""
    ft = lo_col.shape[0]
    lo_t = jnp.broadcast_to(lo_col.transpose(1, 0), (8, ft))
    hi_t = jnp.broadcast_to(hi_col.transpose(1, 0), (8, ft))
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, ft), 0)
    return jnp.where(srow == 0, lo_t, hi_t)


def _sig_quant_vals_flat(vals3, n_mels_real: int, vmax3=None):
    """Flat-mode fused quantization epilogue over the clip-major
    ``[8, pos_tile, m]`` values — the identical elementwise expression
    tree as ``_sig_quant_vals``'s default path (bit-exact per frame; see
    its docstring for the integer tie-break argument), run AFTER the
    sublane permute so the lo/hi columns are born in the out-record's
    axis order. Returns ``(q3 [8, pos, n_mels_real], rng [8, 8, pos])``
    (rng row 0 = lo, row 1 = hi, frames on lanes)."""
    v = vals3[:, :, :n_mels_real]
    lo = jnp.min(v, axis=2, keepdims=True)           # [8, pos, 1]
    hi = (jnp.max(v, axis=2, keepdims=True) if vmax3 is None else vmax3)
    scale = 255.0 / (hi - lo)
    scaled = (v - lo) * scale
    y = jnp.clip((scaled * 2.0).astype(jnp.int32), 0, 511)
    q3 = jnp.minimum((y + 1) >> 1, 255)
    loT = jnp.swapaxes(lo, 1, 2)                     # [8, 1, pos]
    hiT = jnp.swapaxes(hi, 1, 2)
    pos = vals3.shape[1]
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, 8, pos), 1)
    return q3, jnp.where(srow == 0, loT, hiT)


def _sig_vad_counts_flat(vals3, vad: tuple, n_mels_real: int):
    """Flat-mode Sobel VAD epilogue over the clip-major
    ``[8, pos_tile, m]`` values (same decision function as
    ``_sig_vad_counts``; frames are consecutive along axis 1 per clip).
    Columns whose 3-frame patch crosses a tile boundary (every
    ``pos_tile`` frames here) get garbage counts; the host wrapper
    recomputes those columns. Returns ``[8, 8, pos_tile]`` int32
    (clip, replicated sublanes, frame-on-lane)."""
    thr, start_y, _min_y = vad
    ft = vals3.shape[1]
    v = vals3[:, :, :n_mels_real]
    w = n_mels_real - 2

    def a(dt, dm):
        return v[:, dt : ft - 2 + dt, dm : dm + w]

    gx = (a(2, 0) + 2.0 * a(2, 1) + a(2, 2)) - (
        a(0, 0) + 2.0 * a(0, 1) + a(0, 2)
    )
    gy = (a(0, 2) + 2.0 * a(1, 2) + a(2, 2)) - (
        a(0, 0) + 2.0 * a(1, 0) + a(2, 0)
    )
    g2 = gx * gx + gy * gy  # [8, ft-2, w]
    lane = jax.lax.broadcasted_iota(jnp.int32, g2.shape, 2)
    hits = jnp.where((lane >= start_y) & (g2 >= thr), 1, 0)
    counts = jnp.sum(hits, axis=2, keepdims=True)  # [8, ft-2, 1]
    # pad along SUBLANES then swap frames onto lanes: Mosaic rejects
    # lane-dim concats of mixed-offset vectors, the sublane concat +
    # narrow transpose is the same pattern the rows path compiles
    counts = jnp.concatenate(
        [counts, jnp.zeros((8, 2, 1), jnp.int32)], axis=1
    )  # [8, ft, 1]
    return jnp.broadcast_to(jnp.swapaxes(counts, 1, 2), (8, 8, ft))


def _sig_vad_counts(vals, vad: tuple, n_mels_real: int):
    """Fused Sobel VAD epilogue (reference src/vad.rs:373-486 decision
    function): the 3x3 stencil reads only this tile's [frames, mels]
    values, already resident — the separate XLA pass cost a whole
    HBM round trip of the mel tensor. Layout here is [time, mel]
    (the reference's image is [mel, time]), so the stencil's x/y
    roles swap: a(dt, dm) below is the reference's patch entry at
    (row y+dm, col x+dt). Columns whose 3-frame patch crosses the
    tile boundary get garbage counts; the host wrapper recomputes
    those two columns per boundary from the mel output. Returns
    ``[1, frames_tile]`` int32 gradient counts (time on lanes)."""
    thr, start_y, _min_y = vad
    ft = vals.shape[0]
    v = vals[:, :n_mels_real]
    w = n_mels_real - 2

    def a(dt, dm):
        return v[dt : ft - 2 + dt, dm : dm + w]

    gx = (a(2, 0) + 2.0 * a(2, 1) + a(2, 2)) - (
        a(0, 0) + 2.0 * a(0, 1) + a(0, 2)
    )
    gy = (a(0, 2) + 2.0 * a(1, 2) + a(2, 2)) - (
        a(0, 0) + 2.0 * a(1, 0) + a(2, 0)
    )
    g2 = gx * gx + gy * gy  # [ft-2, n_mels_real-2]
    lane = jax.lax.broadcasted_iota(jnp.int32, g2.shape, 1)
    hits = jnp.where((lane >= start_y) & (g2 >= thr), 1, 0)
    counts = jnp.sum(hits, axis=1, keepdims=True)  # [ft-2, 1]
    counts = jnp.concatenate(
        [counts, jnp.zeros((2, 1), jnp.int32)], axis=0
    )
    # time onto lanes, replicated to 8 sublanes: Mosaic requires out
    # blocks with >= 8-row sublane dims, so the counts ride a [8, ft]
    # block (host reads row 0; 7 redundant rows cost ~3 KiB/s of audio)
    return jnp.broadcast_to(counts.transpose(1, 0), (8, counts.shape[0]))


def _sig_mel_tile_kernel(sig_ref, tailpad_ref, m_big_ref, mt_ref, *refs,
                         ks: int, pair_i,
                         k_pad: int, n_bins_pad: int, offset: int,
                         mel_precision, tail_rows: int,
                         row_w: int = _SIG_ROW,
                         phases: int = 4,
                         rows_tile: int = _SIG_ROWS_PER_TILE,
                         out_mode: str = "whisper", guard: float = 0.0,
                         vad: tuple | None = None, n_mels_real: int = 0,
                         pack: int = 0, pack_off: int = 0,
                         quant: bool = False, qabl: str = "",
                         flat: tuple | None = None):
    n_out = 2 if (vad is not None or quant) else 1
    if quant and qabl == "norng":
        n_out = 1
    outs = refs[:n_out]

    if flat is not None:
        # FLAT input: frames straight from the [B, T] signal, no host
        # macro-row relayout (see _sig_flat_geometry); rows are
        # position-major (p*8 + clip)
        pos_tile, n_classes, stride, fetch_w = flat
        s_scratch, dma_sems = refs[n_out:]
        frames = _sig_window_frames_flat(
            sig_ref, s_scratch, dma_sems,
            pos_tile=pos_tile, hop=row_w // phases, k_pad=k_pad,
            offset=offset, stride=stride, n_classes=n_classes,
            fetch_w=fetch_w,
        )
    else:
        s_scratch, dma_sems, tail_sems = refs[n_out:]
        frames = _sig_window_frames(
            sig_ref, tailpad_ref, s_scratch, dma_sems, tail_sems,
            rows=rows_tile, tail_rows=tail_rows, row_w=row_w,
            phases=phases, k_pad=k_pad, offset=offset,
        )
    xcat = _sig_xcat(frames, ks, pair_i, pack or k_pad,
                     m_big_ref.shape[0], pack_off)
    y = jnp.dot(xcat, m_big_ref[:], preferred_element_type=jnp.float32)
    if n_bins_pad == 0:
        # N-packed layout: each column is one re or im component; the
        # re/im add is folded into the projection (mt carries the filter
        # row per component) — see _sig_frontend_matrices
        power = y * y
    else:
        re = y[:, :n_bins_pad]
        im = y[:, n_bins_pad : 2 * n_bins_pad]
        power = re * re + im * im
    energy = _sig_project(power, mt_ref, mel_precision)

    if flat is not None:
        # per-row epilogues (out_vals, quant reductions) are row-order
        # agnostic, so they run on the position-major rows; the sublane
        # permute to clip-major happens once, at each store
        vmax = None
        if quant and qabl == "usemax":
            vals, vmax = _sig_out_vals(energy, out_mode, guard,
                                       want_max=True)
        else:
            vals = _sig_out_vals(energy, out_mode, guard)
        vals3 = _sig_natural_order_flat(vals, pos_tile)
        if quant:
            vmax3 = (None if vmax is None
                     else _sig_natural_order_flat(vmax, pos_tile))
            q3, rng = _sig_quant_vals_flat(vals3, n_mels_real, vmax3)
            outs[0][...] = q3[:, :, : outs[0].shape[-1]] \
                .astype(outs[0].dtype)
            if len(outs) > 1:
                outs[1][...] = rng
        else:
            outs[0][...] = vals3[:, :, : outs[0].shape[-1]]
            if vad is not None:
                outs[1][...] = _sig_vad_counts_flat(vals3, vad,
                                                    n_mels_real)
        return

    vmax = None
    if quant and qabl == "usemax":
        # ablation: reuse the whisper head's existing lane max as hi
        # (bit-exact — see _sig_out_vals) at the cost of permuting the
        # [frames, 1] column into natural order alongside vals
        pre, vmax = _sig_out_vals(energy, out_mode, guard, want_max=True)
        vals = _sig_natural_order(pre, phases, rows_tile)
        if vmax is not None:
            vmax = _sig_natural_order(vmax, phases, rows_tile)
    else:
        vals = _sig_natural_order(_sig_out_vals(energy, out_mode, guard),
                                  phases, rows_tile)
    if quant:
        q, rng = _sig_quant_vals(vals, n_mels_real, vmax, qabl=qabl)
        outs[0][0] = q[:, : outs[0].shape[-1]].astype(outs[0].dtype)
        if len(outs) > 1:
            outs[1][0] = rng
    else:
        outs[0][0] = vals[:, : outs[0].shape[-1]]
        if vad is not None:
            outs[1][0] = _sig_vad_counts(vals, vad, n_mels_real)


def _sig_host_prep(samples: jnp.ndarray, tiles: int, row_w: int,
                   rows_tile: int):
    """Host-side (traced) input prep shared by every signal-input kernel
    wrapper: reshape the clip into macro-rows, zero-copy when the length
    allows it, else pad. Returns ``(sig [b, rows_clip, row_w],
    tailpad [b, 8, row_w], tail_rows)``."""
    b, t = samples.shape
    # rows per clip padded to 8-row DMA granularity past the last tile
    rows = rows_tile * tiles + 8
    need = rows * row_w
    rows_real = t // row_w
    tail = rows_real - (tiles - 1) * rows_tile
    if t % row_w == 0 and tail >= 8:
        # ZERO-COPY input: T is a whole number of macro-rows and every
        # non-final tile's full window fits inside the clip, so the input
        # reshapes straight into macro-rows and the kernel clamps the last
        # tile's DMA to the rows that exist (all standard clip lengths —
        # multiples of 0.04 s — take this path; it removes a whole-input
        # pad copy, ~5% of runtime at the bench configs). The < 8 ragged
        # remainder rows ride a tiny second input (Mosaic DMAs need
        # 8-aligned sizes).
        rows_clip = rows_real
        tail_rows = min(tail, rows_tile + 8)
        ragged = tail_rows - (tail_rows // 8) * 8
        if ragged:
            start = ((tiles - 1) * rows_tile
                     + tail_rows - ragged) * row_w
            tailpad = jnp.pad(
                samples[:, start : start + ragged * row_w],
                ((0, 0), (0, (8 - ragged) * row_w)),
            )
        else:
            tailpad = jnp.zeros((b, 8 * row_w), samples.dtype)
    else:
        rows_clip = rows
        tail_rows = rows_tile + 8
        tailpad = jnp.zeros((b, 8 * row_w), samples.dtype)
        if t < need:
            samples = jnp.pad(samples, ((0, 0), (0, need - t)))
        else:
            samples = samples[:, :need]
    return (samples.reshape(b, rows_clip, row_w),
            tailpad.reshape(b, 8, row_w), tail_rows)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "ks", "pair_i", "n_frames", "offset",
                     "mel_precision", "n_mels_out", "out_mode", "guard",
                     "row_w", "phases", "rows_tile", "vad", "pack",
                     "pack_off", "npack", "quant", "qabl", "input_mode",
                     "flat_rows"),
)
def _pallas_sig_mel(
    samples: jnp.ndarray,  # [B, T] float32 raw signal
    m_big, mt,
    *,
    interpret: bool,
    ks: int,
    pair_i: tuple,
    n_frames: int,
    offset: int = 0,
    mel_precision=jax.lax.Precision.HIGHEST,
    n_mels_out: int = 0,
    out_mode: str = "whisper",
    guard: float = 0.0,
    row_w: int = _SIG_ROW,
    phases: int = 4,
    rows_tile: int = _SIG_ROWS_PER_TILE,
    vad: tuple | None = None,
    pack: int = 0,
    pack_off: int = 0,
    npack: bool = False,
    quant: bool = False,
    qabl: str = "",
    input_mode: str = "auto",
    flat_rows: int = 512,
) -> jnp.ndarray:
    """Whisper log-mel from the raw signal, framing fused into the kernel.
    Returns ``[B, n_frames, n_mels_out or n_mels_pad]`` in natural frame
    order, written DIRECTLY in its final layout by the kernel: the phase
    reindex happens as a VMEM sublane permute per tile and the mel-lane
    trim via the out block's last dim, so there is no padded
    ``[b, tiles, frames_tile, n_mels_pad]`` intermediate nor any XLA
    reshape/transpose/trim epilogue (the 2x large-batch regression of
    round 2 was exactly those two whole-output HBM round trips)."""
    b, t = samples.shape
    # split layout: re|im halves; N-packed (npack): n_bins_pad = 0 tells
    # the kernel every column is a single squared component
    n_bins_pad = 0 if npack else m_big.shape[1] // 2
    n_mels_pad = mt.shape[1]
    # frame width in VMEM (lane-aligned); with a packed m_big the real
    # tap count rides `pack`, otherwise K blocks are k_pad tall
    k_pad = (-(-(pack_off + pack) // LANES) * LANES if pack
             else m_big.shape[0] // len(pair_i))
    # FLAT input mode: consume the [B, T] signal as-is (batch-on-
    # sublanes framing, no host macro-row relayout — see
    # _sig_flat_geometry). Auto-selected whenever the geometry allows;
    # quant ablation variants stay rows-only (measurement-only paths).
    flat = None
    if input_mode != "rows" and not (quant and qabl not in ("", "usemax")):
        flat = _sig_flat_geometry(row_w // phases, k_pad, offset, b, t,
                                  target_rows=flat_rows,
                                  epilogue=(vad is not None or quant))
    if input_mode == "flat" and flat is None:
        raise ValueError(
            "flat input mode needs B % 8 == 0 and T % 128 == 0"
        )
    if flat is not None:
        frames_tile = flat[0]          # frames per clip per tile
        tiles = -(-n_frames // frames_tile)
        tail_rows = 0
    else:
        frames_tile = phases * rows_tile
        tiles = -(-n_frames // frames_tile)
        sig, tailpad, tail_rows = _sig_host_prep(samples, tiles, row_w,
                                                 rows_tile)

    out_lanes = n_mels_out or n_mels_pad
    kernel = functools.partial(
        _sig_mel_tile_kernel, ks=ks, pair_i=pair_i, k_pad=k_pad,
        n_bins_pad=n_bins_pad, offset=offset, mel_precision=mel_precision,
        tail_rows=tail_rows,
        row_w=row_w, phases=phases, rows_tile=rows_tile,
        out_mode=out_mode, guard=guard,
        vad=vad,
        n_mels_real=(128 if (quant and qabl == "lanes128") else out_lanes),
        pack=pack, pack_off=pack_off,
        quant=quant, qabl=qabl,
        flat=flat,
    )
    if flat is not None:
        base = kernel
        kernel = lambda s, m, t_, *r: base(s, None, m, t_, *r)  # noqa: E731
    if quant and vad is not None:
        raise NotImplementedError("quant + fused VAD in one kernel call")
    # final layout directly: the time dim need not divide frames_tile
    # (pallas clips the last block's stores), the lane dim is the real
    # n_mels — no padded intermediate, no epilogue. In flat mode the
    # clip dim blocks by 8 (one block per sublane group).
    cb = 8 if flat is not None else 1
    out_specs = pl.BlockSpec(
        (cb, frames_tile, out_lanes),
        lambda bb, tt: (bb, tt, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct((b, n_frames, out_lanes), jnp.float32)
    if quant:
        # u8 payload + per-frame [lo | hi] range — the wire-record fields
        q_lanes = 128 if qabl == "lanes128" else out_lanes
        q_dtype = jnp.int32 if qabl == "i32store" else jnp.uint8
        if qabl in ("oldmath", "narrowrng", "fullrng"):
            rng_lanes = 2 if qabl != "fullrng" else LANES
            rng_spec = pl.BlockSpec(
                (1, frames_tile, rng_lanes), lambda bb, tt: (bb, tt, 0),
                memory_space=pltpu.VMEM,
            )
            rng_shape = jax.ShapeDtypeStruct((b, n_frames, rng_lanes),
                                             jnp.float32)
        else:
            # frames-on-lanes rng record (see _sig_quant_vals): row 0 =
            # lo, row 1 = hi; the wrapper slices the two rows
            rng_spec = pl.BlockSpec(
                (cb, 8, frames_tile), lambda bb, tt: (bb, 0, tt),
                memory_space=pltpu.VMEM,
            )
            rng_shape = jax.ShapeDtypeStruct((b, 8, n_frames), jnp.float32)
        out_specs = (pl.BlockSpec(
            (cb, frames_tile, q_lanes), lambda bb, tt: (bb, tt, 0),
            memory_space=pltpu.VMEM,
        ), rng_spec)
        out_shape = (
            jax.ShapeDtypeStruct((b, n_frames, q_lanes), q_dtype),
            rng_shape,
        )
        if qabl == "norng":
            out_specs, out_shape = (out_specs[0],), (out_shape[0],)
    if vad is not None:
        out_specs = (out_specs, pl.BlockSpec(
            (cb, 8, frames_tile), lambda bb, tt: (bb, 0, tt),
            memory_space=pltpu.VMEM,
        ))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((b, 8, n_frames), jnp.int32))
    if flat is not None:
        pos_tile, _n_classes, _stride, fetch_w = flat
        return pl.pallas_call(
            kernel,
            grid=(b // 8, tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # FLAT [B, T] signal
                pl.BlockSpec(memory_space=pltpu.VMEM),  # m_big
                pl.BlockSpec(memory_space=pltpu.VMEM),  # mt
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((2, 8, fetch_w), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * b * tiles * frames_tile
                * (m_big.shape[0] * m_big.shape[1]
                   + mt.shape[0] * n_mels_pad),
                bytes_accessed=(b * t * 4 // 2
                                + (b // 8) * tiles * 8 * fetch_w * 4
                                + b * n_frames
                                * ((out_lanes + 8) if quant
                                   else out_lanes * 4)),
                transcendentals=b * tiles * frames_tile * n_mels_pad,
            ),
            interpret=interpret,
        )(samples, m_big, mt)
    return pl.pallas_call(
        kernel,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # macro-row signal
            pl.BlockSpec(memory_space=pltpu.HBM),    # ragged tail rows
            pl.BlockSpec(memory_space=pltpu.VMEM),   # m_big
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mt
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, rows_tile + 8, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tiles * frames_tile
            * (m_big.shape[0] * m_big.shape[1]
               + mt.shape[0] * n_mels_pad),
            bytes_accessed=(b * (rows_tile * tiles + 8) * row_w * 4
                            + b * n_frames
                            * ((out_lanes + 8) if quant
                               else out_lanes * 4)),
            transcendentals=b * tiles * frames_tile * n_mels_pad,
        ),
        interpret=interpret,
    )(sig, tailpad, m_big, mt)


def whisper_mel_sig(
    samples,
    fft_size: int = 400,
    hop_size: int = 160,
    n_mels: int = 80,
    sampling_rate: float = 16000.0,
    streaming: bool = False,
    interpret: bool = False,
    ks: int = 3,
    cutoff: int = 2,
    mel_precision="bf2",
    input_mode: str = "auto",
    flat_rows: int = 512,
) -> jnp.ndarray:
    """Whisper log-mel via the signal-input fused kernel (bf3 numerics +
    in-kernel framing). Works for any config ``sig_geometry`` accepts
    (hop >= 8 samples and the frame fitting a reasonable macro-row
    window — every standard speech-frontend config qualifies); others
    should use ``whisper_mel_pallas``. Same output contract as
    ``whisper_mel_pallas``.

    ``mel_precision``: ``"bf2"`` (default) runs the mel projection as a
    2-slice rounded-bf16 K-concat (3 MXU passes, measured 2.3e-6 JFK
    parity — 4x under the 1e-5 gate); ``jax.lax.Precision.HIGHEST``
    restores the f32 6-pass projection (1.7e-6) at ~8% lower throughput.

    The pair-schedule dial is measured, not negotiable: ``(ks=2,
    cutoff=1)`` — 3 DFT passes instead of 6 — collapses JFK parity to
    1.0e-3, because dropping the (1,1) slice pair leaves 2^-16-scale
    ABSOLUTE spectral error that swamps quiet bins (the same reason the
    plain-f32 XLA path misses the bar). (3, 3, 2) is the minimum schedule
    with 24-bit absolute accuracy."""
    x = jnp.asarray(samples, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    offset = 0
    if streaming:
        offset = framing.streaming_frame_offset(fft_size, hop_size)
        n_frames = framing.num_frames_streaming(x.shape[-1], fft_size,
                                                hop_size)
    else:
        n_frames = framing.num_frames_batch(x.shape[-1], fft_size, hop_size)
    geom = sig_geometry(fft_size, hop_size, offset)
    if geom is None:
        raise ValueError(
            "no macro-row geometry for this (fft, hop) — use "
            "whisper_mel_pallas(impl='bf3')"
        )
    row_w, phases, rows_tile = geom
    if n_frames <= 0:
        out = jnp.zeros((x.shape[0], 0, n_mels), jnp.float32)
        return out[0] if squeeze else out

    m_big, pair_i, mt, mt_bf2, _, _, _, npack = _sig_device_matrices(
        fft_size, n_mels, float(sampling_rate), ks, ks, cutoff
    )
    if mel_precision == "bf2":
        mt = mt_bf2

    # No batch chunking needed: the kernel writes its output directly in
    # the final [b, n_frames, n_mels] layout, so — unlike round 2, where a
    # padded phase-major tensor plus its reindex copy (~1 KiB/frame) had
    # to be bounded by an HBM budget — the only device tensors are the
    # input and the exact output. The reference's 64 MiB device-batch cap
    # (src/cuda.rs:150-155) guarded the same class of intermediate.
    b_real = x.shape[0]
    if input_mode != "rows":
        x = _pad_for_flat(x, hop_size, -(-fft_size // LANES) * LANES,
                          offset, epilogue=False, flat_rows=flat_rows)
    out = _pallas_sig_mel(
        x, m_big, mt, interpret=interpret, ks=ks, pair_i=pair_i,
        n_frames=n_frames, offset=offset, mel_precision=mel_precision,
        n_mels_out=n_mels, row_w=row_w, phases=phases,
        rows_tile=rows_tile, pack=fft_size, npack=npack,
        input_mode=input_mode, flat_rows=flat_rows,
    )[:b_real]
    return out[0] if squeeze else out


def whisper_mel_quantized(
    samples,
    fft_size: int = 400,
    hop_size: int = 160,
    n_mels: int = 80,
    sampling_rate: float = 16000.0,
    streaming: bool = False,
    interpret: bool = False,
    ks: int = 3,
    cutoff: int = 2,
    mel_precision="bf2",
    qabl: str = "",
):
    """Whisper log-mel emitted DIRECTLY as per-frame 8-bit wire records:
    ``(q [B, T, n_mels] uint8, lo [B, T] f32, hi [B, T] f32)``.

    The reference's live path quantizes every emitted mel column with its
    own min/max range before shipping it (``src/wasm.rs:95-145``, the
    browser worker's ``min | max | u8[n_mels]`` record,
    ``examples/browser/worker.js:52-58``). Here that quantization runs in
    the sig kernel's epilogue while the frame values are still VMEM
    resident, bit-exact with ``ops.quant.quantize_frames_jnp`` — the f32
    mel tensor never exists in HBM, and the device writes (and any
    host fetch) shrink from ``4 * n_mels`` bytes/frame to
    ``n_mels + 8``. Same geometry/accuracy contract as
    ``whisper_mel_sig``; 1-D input returns unbatched arrays."""
    x = jnp.asarray(samples, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    offset = 0
    if streaming:
        offset = framing.streaming_frame_offset(fft_size, hop_size)
        n_frames = framing.num_frames_streaming(x.shape[-1], fft_size,
                                                hop_size)
    else:
        n_frames = framing.num_frames_batch(x.shape[-1], fft_size, hop_size)
    geom = sig_geometry(fft_size, hop_size, offset)
    if geom is None:
        raise ValueError(
            "no macro-row geometry for this (fft, hop) — quantize the "
            "whisper_mel_pallas output with quantize_frames_jnp instead"
        )
    row_w, phases, rows_tile = geom
    if n_frames <= 0:
        q = jnp.zeros((x.shape[0], 0, n_mels), jnp.uint8)
        z = jnp.zeros((x.shape[0], 0), jnp.float32)
        return (q[0], z[0], z[0]) if squeeze else (q, z, z)

    m_big, pair_i, mt, mt_bf2, _, _, _, npack = _sig_device_matrices(
        fft_size, n_mels, float(sampling_rate), ks, ks, cutoff
    )
    if mel_precision == "bf2":
        mt = mt_bf2
    b_real = x.shape[0]
    if qabl in ("", "usemax"):  # ablation variants stay rows-only
        x = _pad_for_flat(x, hop_size, -(-fft_size // LANES) * LANES,
                          offset, epilogue=True)
    out = _pallas_sig_mel(
        x, m_big, mt, interpret=interpret, ks=ks, pair_i=pair_i,
        n_frames=n_frames, offset=offset, mel_precision=mel_precision,
        n_mels_out=n_mels, row_w=row_w, phases=phases,
        rows_tile=rows_tile, pack=fft_size, npack=npack, quant=True,
        qabl=qabl,
    )
    if qabl == "norng":  # perf-ablation only: no range output exists
        q = out[0][:b_real]
        z = jnp.zeros(q.shape[:-1], jnp.float32)
        return (q[0], z[0], z[0]) if squeeze else (q, z, z)
    q, rng = out
    q = q[:b_real]
    if qabl in ("oldmath", "narrowrng", "fullrng"):
        lo, hi = rng[:b_real, ..., 0], rng[:b_real, ..., 1]
    else:
        lo, hi = rng[:b_real, 0, :], rng[:b_real, 1, :]
    return (q[0], lo[0], hi[0]) if squeeze else (q, lo, hi)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "ks", "pair_i", "n_frames", "offset",
                     "mel_precision", "n_mels_out", "row_w", "phases",
                     "rows_tile", "settings", "bidx", "pack", "npack"),
)
def _sig_mel_vad_jit(x, m_big, mt, *, interpret, ks, pair_i, n_frames,
                     offset, mel_precision, n_mels_out, row_w, phases,
                     rows_tile, settings, bidx, pack=0, npack=False):
    """Fused mel+VAD call plus the tile-boundary column fix, one device
    program. ``bidx`` is the (static) tuple of raw-column indices whose
    3-frame Sobel patch crosses a kernel tile boundary — two per boundary;
    they are recomputed from the mel output via the XLA ``classify_columns``
    (identical f32 expression tree, so decisions match the pure-XLA path
    exactly)."""
    from melspec_tpu.ops.vad import classify_columns

    thr = float(settings.min_energy) ** 2
    start_y = min(int(settings.min_mel), n_mels_out - 2)
    mel, counts = _pallas_sig_mel(
        x, m_big, mt, interpret=interpret, ks=ks, pair_i=pair_i,
        n_frames=n_frames, offset=offset, mel_precision=mel_precision,
        n_mels_out=n_mels_out, row_w=row_w, phases=phases,
        rows_tile=rows_tile, pack=pack, npack=npack,
        vad=(thr, start_y, int(settings.min_y)),
    )
    raw = counts[:, 0, : n_frames - 2] >= int(settings.min_y)
    if bidx:
        tri = jnp.stack([mel[:, x : x + 3, :] for x in bidx], axis=1)
        img = jnp.swapaxes(tri, -1, -2)  # [b, nb, n_mels, 3]
        fix = classify_columns(img, settings)[..., 0]  # [b, nb]
        raw = raw.at[:, jnp.asarray(bidx)].set(fix)
    return mel, raw


def whisper_mel_vad_sig(
    samples,
    settings,
    fft_size: int = 400,
    hop_size: int = 160,
    n_mels: int = 80,
    sampling_rate: float = 16000.0,
    streaming: bool = False,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whisper log-mel + raw Sobel VAD column activity in ONE fused kernel.

    Returns ``(mel [..., n_frames, n_mels], raw [..., n_frames-2] bool)``
    where ``raw`` equals ``classify_columns(mel.T, settings)`` — the
    reference's per-column decision input (``src/vad.rs:373-415``) — but
    computed as a kernel epilogue on the tile already resident in VMEM,
    so VAD costs ~nothing on top of the mel itself (the separate XLA pass
    re-read the whole mel tensor from HBM).
    """
    x = jnp.asarray(samples, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    offset = 0
    if streaming:
        offset = framing.streaming_frame_offset(fft_size, hop_size)
        n_frames = framing.num_frames_streaming(x.shape[-1], fft_size,
                                                hop_size)
    else:
        n_frames = framing.num_frames_batch(x.shape[-1], fft_size, hop_size)
    geom = sig_geometry(fft_size, hop_size, offset)
    if geom is None:
        raise ValueError(
            "no macro-row geometry for this (fft, hop) — compute the mel "
            "via whisper_mel_pallas and classify_columns separately"
        )
    if n_mels < 3:
        raise ValueError("Sobel VAD needs n_mels >= 3")
    row_w, phases, rows_tile = geom
    if n_frames < 3:
        # too short for any 3x3 Sobel column, but the mel contract still
        # holds: compute the real 1-2 frames via the plain sig kernel
        # (returning zeros here would silently corrupt short utterances)
        if n_frames > 0:
            mel = whisper_mel_sig(x, fft_size, hop_size, n_mels,
                                  sampling_rate, streaming=streaming,
                                  interpret=interpret)
        else:
            mel = jnp.zeros((x.shape[0], 0, n_mels), jnp.float32)
        raw = jnp.zeros((x.shape[0], 0), bool)
        return (mel[0], raw[0]) if squeeze else (mel, raw)

    m_big, pair_i, mt, mt_bf2, _, _, _, npack = _sig_device_matrices(
        fft_size, n_mels, float(sampling_rate), 3, 3, 2
    )
    b_real = x.shape[0]
    x = _pad_for_flat(x, hop_size, -(-fft_size // LANES) * LANES,
                      offset, epilogue=True)
    frames_tile = sig_effective_frames_tile(
        fft_size, hop_size, offset, x.shape[0], x.shape[-1], phases,
        rows_tile,
    )
    tiles = -(-n_frames // frames_tile)
    bidx = tuple(
        xcol
        for k in range(1, tiles)
        for xcol in (k * frames_tile - 2, k * frames_tile - 1)
        if xcol < n_frames - 2
    )
    mel, raw = _sig_mel_vad_jit(
        x, m_big, mt_bf2, interpret=interpret, ks=3, pair_i=pair_i,
        n_frames=n_frames, offset=offset, mel_precision="bf2",
        n_mels_out=n_mels, row_w=row_w, phases=phases,
        rows_tile=rows_tile, settings=settings, bidx=bidx,
        pack=fft_size, npack=npack,
    )
    mel, raw = mel[:b_real], raw[:b_real]
    return (mel[0], raw[0]) if squeeze else (mel, raw)


@functools.lru_cache(maxsize=8)
@_host_built
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
@_host_built
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
    hp_n_slices: int | None = None,
    hp_max_pair_sum: int | None = None,
    impl: str | None = None,
) -> jnp.ndarray:
    """Whisper log-mel via the fused Pallas kernel.

    ``samples``: ``[T]`` or ``[B, T]`` float32. Returns
    ``[..., n_frames, n_mels]`` (batch framing) or, with
    ``streaming=True``, the streaming-equivalent frames (offset by
    ``ceil(fft/hop)*hop - fft``, reference ring-pipeline semantics) in the
    same frame-major layout — transpose for the golden's feature-major
    view.

    ``impl`` selects the kernel (default ``None`` resolves to ``"sig"``
    wherever the macro-row geometry applies — every standard config —
    and to ``"bf3"`` otherwise):
    - ``"bf3"``: rounded-bf16 3-slice pair kernel — the
      MXU cost of ONE HIGHEST-precision f32 dot (6 bf16 passes) with the
      window folded exactly into the sliced matrices; ~1.5e-6 JFK parity.
      The shipped fast path.
    - ``"hp8"``: int8-Ozaki fused kernel — exact 7-bit integer slices,
      default (4 slices, cutoff 4), ~1.5e-6 parity; more passes than bf3.
    - ``"hp_bf16"``: the integer-bf16-slice kernel (default 5 slices /
      cutoff 5, ~3e-7 parity). Also selected by the legacy ``hp=True``.
    - ``"f32"``: plain f32 kernel with HIGHEST-precision dots (kept for
      comparison).
    """
    if impl is None:
        if hp:
            impl = "hp_bf16"
        else:
            # the signal-input kernel (in-kernel framing) is the fast path
            # wherever its macro-row geometry applies
            off_ = (framing.streaming_frame_offset(fft_size, hop_size)
                    if streaming else 0)
            impl = "sig" if sig_geometry(fft_size, hop_size,
                                         off_) is not None else "bf3"
    if impl not in ("sig", "bf3", "hp8", "hp_bf16", "f32"):
        raise ValueError(
            "impl must be 'sig', 'bf3', 'hp8', 'hp_bf16' or 'f32'"
        )
    if impl == "sig":
        return whisper_mel_sig(
            samples, fft_size, hop_size, n_mels, sampling_rate,
            streaming=streaming, interpret=interpret,
            ks=3 if hp_n_slices is None else hp_n_slices,
            cutoff=2 if hp_max_pair_sum is None else hp_max_pair_sum,
        )
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

    # measured-best tile sizes (v5e)
    tile = 512 if impl == "hp_bf16" else TILE_FRAMES
    if impl == "bf3":
        ks = 3 if hp_n_slices is None else hp_n_slices
        cutoff = 2 if hp_max_pair_sum is None else hp_max_pair_sum
        ks = min(ks, cutoff + 1)  # slices past the pair-sum budget drop
        slice_mats, mt, _, _, _ = _bf3_device_matrices(
            fft_size, n_mels, float(sampling_rate), ks, ks, cutoff
        )
        mats = (mt,) + tuple(slice_mats)
    elif impl == "hp8":
        ks = 4 if hp_n_slices is None else hp_n_slices
        cutoff = 4 if hp_max_pair_sum is None else hp_max_pair_sum
        ks = min(ks, cutoff + 1)
        slice_mats, mt, _, _, _ = _hp8_device_matrices(
            fft_size, n_mels, float(sampling_rate), ks, ks, cutoff
        )
        mats = (mt,) + tuple(slice_mats)
    elif impl == "hp_bf16":
        ks = 5 if hp_n_slices is None else hp_n_slices
        cutoff = 5 if hp_max_pair_sum is None else hp_max_pair_sum
        # slices past the pair-sum budget pair with nothing (i + 0 >
        # cutoff): without this clamp their full-width matmuls run and
        # every output is discarded (the bf3/hp8 branches clamp too)
        ks = min(ks, cutoff + 1)
        cs, ss, mt, _, _, _ = _hp_device_matrices(
            fft_size, n_mels, float(sampling_rate), ks
        )
        mats = (cs, ss, mt)
    else:
        ks = cutoff = 0
        cw, sw, mt, _, _, _ = _f32_device_matrices(
            fft_size, n_mels, float(sampling_rate)
        )
        mats = (cw, sw, mt)
    out = _framed_pallas_mel(
        x, mats, impl=impl, fft_size=fft_size, hop_size=hop_size,
        n_frames=n_frames, n_mels=n_mels, tile=tile, interpret=interpret,
        ks=ks, cutoff=cutoff,
    )
    return out[0] if squeeze else out


@functools.partial(
    jax.jit,
    static_argnames=("impl", "fft_size", "hop_size", "n_frames", "n_mels",
                     "tile", "interpret", "ks", "cutoff"),
)
def _framed_pallas_mel(x, mats, *, impl, fft_size, hop_size, n_frames,
                       n_mels, tile, interpret, ks, cutoff):
    """Framing + padding + kernel + trim as ONE device program. Eager
    framing used to cost several extra full-tensor dispatches per call
    (gather, reshape, two pads, the final slice) — the same disease the
    sig kernel's eager n_mels trim had."""
    batch = x.shape[0]
    total = batch * n_frames
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
    if impl == "bf3":
        out = _pallas_bf3_mel_frames(
            frames, mats[0], *mats[1:], interpret=interpret,
            ks=ks, km=ks, cutoff=cutoff, tile_frames=tile,
        )
    elif impl == "hp8":
        out = _pallas_hp8_mel_frames(
            frames, mats[0], *mats[1:], interpret=interpret,
            ks=ks, km=ks, cutoff=cutoff, tile_frames=tile,
        )
    elif impl == "hp_bf16":
        out = _pallas_hp_mel_frames(
            frames, mats[0], mats[1], mats[2], interpret=interpret,
            tile_frames=tile, n_slices=ks, max_pair_sum=cutoff,
        )
    else:
        out = _pallas_mel_frames(frames, mats[0], mats[1], mats[2],
                                 interpret=interpret)
    return out[:total, :n_mels].reshape(batch, n_frames, n_mels)
