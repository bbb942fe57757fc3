"""High-precision real-DFT on the MXU: exact split-matmul (Ozaki scheme).

Problem: a plain f32 DFT leaves quiet spectral bins at the f32 roundoff
floor (~1e-7 of the frame amplitude => ~1e-14 of peak power), and the
whisper norm's 8-decade window exposes that floor (see
``tests/test_spectrogram.py``). Computing in f64 on TPU is emulated and
slow.

Solution: split the (row-normalized) signal and the DFT matrices into
7-bit integer slices. Every slice value is an integer <= 2^7, exactly
representable in bfloat16, and a K<=512 dot of slice products (<= 2^14
each) stays below 2^23 — so a bf16 x bf16 -> f32 MXU matmul computes each
slice-pair product EXACTLY, at full systolic-array speed. Recombining the
slice pairs (scaled by powers of 2^-7) in float64 recovers the DFT to
~2^-30 relative to the frame amplitude — deeper than f32 itself — while
every FLOP ran at bf16 rate. This is how the framework meets the
"<= 1e-5 vs f64 goldens at >= 50k x realtime" bar that neither plain f32
(too noisy) nor emulated f64 (too slow) can.

Reference context: the crate this replaces runs its GPU path in f64 cuFFT
(``src/cuda.rs:38-82``) and still gates parity at max<0.08; this path is
both faster per FLOP and tighter.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.ops import dft

SLICE_BITS = 7
SLICE_SCALE = float(1 << SLICE_BITS)  # 128.0


def matrix_slices(mat: np.ndarray, n_slices: int) -> Tuple[np.ndarray, ...]:
    """Slice a float64 matrix with ``|mat| <= 1`` into integer-valued
    matrices: ``mat ~= sum_j M_j * 128^-(j+1)`` with ``|M_j| <= 128``."""
    out = []
    residual = np.asarray(mat, np.float64).copy()
    for _ in range(n_slices):
        scaled = residual * SLICE_SCALE
        t = np.trunc(scaled)
        residual = scaled - t
        out.append(t.astype(np.float32))
    return tuple(out)


@functools.lru_cache(maxsize=16)
def _dft_matrix_slices(
    fft_size: int, n_bins: int, n_slices: int, windowed: bool,
    frame_len: int = 0,
) -> Tuple[Tuple[np.ndarray, ...], Tuple[np.ndarray, ...]]:
    """7-bit slices of the (optionally window-folded) DFT matrices.
    Folding the window in keeps the signal path exact: the f32 product
    ``frames * window`` would inject 2^-24-relative element noise, which a
    512-point dot amplifies to ~2^-21 of the frame amplitude — right at the
    1e-5 parity bar this path exists to beat. ``windowed`` selects the
    periodic Hann; for other windows use ``hp_rdft_power_windowed``.
    ``frame_len`` truncates the matrices for zero-padded framing (Kaldi's
    400-in-512)."""
    if windowed and frame_len:
        # a truncated full-fft Hann matches no real pipeline (Kaldi's
        # 400-in-512 uses a 400-point Povey) — callers wanting a custom
        # window with zero-padded framing use hp_rdft_power_windowed
        raise ValueError("windowed=True cannot combine with frame_len; "
                         "fold the real window via hp_rdft_power_windowed")
    cos_m, msin_m = dft.rdft_matrices(fft_size, n_bins)
    if frame_len:
        cos_m = cos_m[:frame_len]
        msin_m = msin_m[:frame_len]
    if windowed:
        from melspec_tpu.ops.windows import hann_periodic

        w = hann_periodic(fft_size)[:, None]
        cos_m = w * cos_m
        msin_m = w * msin_m
    return matrix_slices(cos_m, n_slices), matrix_slices(msin_m, n_slices)


def hp_rdft_power_windowed(
    frames: jnp.ndarray,
    window: np.ndarray,
    fft_size: int,
    n_bins: int,
    n_slices: int = 5,
    max_pair_sum: int = 5,
) -> jnp.ndarray:
    """hp power spectrum with an arbitrary float64 window folded into the
    sliced matrices. ``frames`` are RAW (unwindowed) ``[..., frame_len]``
    with ``frame_len = len(window) <= fft_size`` (implicit zero padding,
    like Kaldi's 400-sample frames in a 512 FFT)."""
    frame_len = len(window)
    cos_m, msin_m = dft.rdft_matrices(fft_size, n_bins)
    w = np.asarray(window, np.float64)[:, None]
    # Keyed on the window bytes themselves (not their hash — a 64-bit hash
    # collision would silently return the wrong matrices) and bounded like
    # the lru_cache used elsewhere.
    key = (fft_size, n_bins, n_slices, frame_len, w.tobytes())
    cached = _windowed_cache.get(key)
    if cached is None:
        cached = (
            matrix_slices(w * cos_m[:frame_len], n_slices),
            matrix_slices(w * msin_m[:frame_len], n_slices),
        )
        if len(_windowed_cache) >= _WINDOWED_CACHE_MAX:
            _windowed_cache.pop(next(iter(_windowed_cache)))
        _windowed_cache[key] = cached
    cs, ss = cached
    return _hp_power_from_slices(frames, cs, ss, n_bins, n_slices,
                                 max_pair_sum)


_windowed_cache: dict = {}
_WINDOWED_CACHE_MAX = 16


# --------------------------------------------------------------------------
# Rounded-bf16 3-slice scheme ("bf3"): the throughput-oriented sibling of
# the integer Ozaki split above. Instead of exact 7-bit integer slices it
# uses successive bfloat16 ROUNDINGS of the residual (scale-free, ~8 bits
# per level, no row normalization); slice pairs with i+j <= cutoff are
# plain bf16 MXU matmuls with f32 accumulation. With (ks=3, km=3,
# cutoff=2) that is 6 bf16 passes — the exact MXU cost of ONE
# precision=HIGHEST f32 matmul — while the window stays exact (folded into
# the float64 matrices before slicing). Measured JFK whisper-mel parity:
# 3.2e-6 vs the f64 reference, where the plain f32 pipeline sits at
# 1.3e-5 (the f32 `frames * window` product is the dominant noise).
# --------------------------------------------------------------------------


def bf16_round_slices(mat: np.ndarray, n_slices: int) -> Tuple[np.ndarray, ...]:
    """``mat ~= sum_j M_j`` with ``M_j`` bf16 and ``|M_j| <= 2^-8j |mat|``:
    each level is the bf16 rounding of the running residual."""
    out = []
    residual = np.asarray(mat, np.float64).copy()
    for _ in range(n_slices):
        t = residual.astype(jnp.bfloat16).astype(np.float64)
        residual = residual - t
        out.append(t.astype(jnp.bfloat16))
    return tuple(out)


@functools.lru_cache(maxsize=16)
def _bf3_matrix_planes(
    fft_size: int, n_bins: int, km: int, windowed: bool, frame_len: int = 0
) -> Tuple[Tuple[np.ndarray, ...], Tuple[np.ndarray, ...]]:
    cos_m, msin_m = dft.rdft_matrices(fft_size, n_bins)
    if frame_len:
        cos_m = cos_m[:frame_len]
        msin_m = msin_m[:frame_len]
    if windowed:
        from melspec_tpu.ops.windows import hann_periodic

        w = hann_periodic(fft_size)[: cos_m.shape[0], None]
        cos_m = w * cos_m
        msin_m = w * msin_m
    return bf16_round_slices(cos_m, km), bf16_round_slices(msin_m, km)


def bf3_rdft_power(
    frames: jnp.ndarray,
    fft_size: int,
    n_bins: int,
    ks: int = 3,
    km: int = 3,
    cutoff: int = 2,
    hann_windowed: bool = False,
) -> jnp.ndarray:
    """``|rfft(frames)|^2`` over the first ``n_bins`` bins via rounded-bf16
    slice pairs. ``frames`` are RAW (unwindowed) when ``hann_windowed``;
    float32 in, float32 power out."""
    cos_planes, sin_planes = _bf3_matrix_planes(
        fft_size, n_bins, km, hann_windowed
    )
    x = frames.astype(jnp.float32)
    ks = min(ks, cutoff + 1)  # slices past the pair-sum budget pair with
    # nothing; without the clamp the plane concatenation below is empty
    terms_re: dict = {}
    terms_im: dict = {}
    residual = x
    for i in range(ks):
        # reduce_precision, NOT astype(bf16): under XLA's
        # allow-excess-precision mode (on by default on TPU) a plain
        # downcast may be folded away, collapsing `residual - bf16(residual)`
        # to zero and silently destroying slices 1..ks-1. reduce_precision
        # is the contract that the rounding really happens.
        xs_f32 = jax.lax.reduce_precision(residual, 8, 7)
        xs = xs_f32.astype(jnp.bfloat16)
        if i + 1 < ks:
            residual = residual - xs_f32
        n_p = min(cutoff - i, km - 1) + 1
        # one wide matmul per signal slice: [.., K] @ [K, n_p * 2 * n_bins]
        m_all = jnp.concatenate(
            [jnp.asarray(p) for p in
             cos_planes[:n_p] + sin_planes[:n_p]], axis=1
        )
        y = jnp.matmul(xs, m_all, preferred_element_type=jnp.float32)
        for j in range(n_p):
            s = i + j
            yr = y[..., j * n_bins : (j + 1) * n_bins]
            yi = y[..., (n_p + j) * n_bins : (n_p + j + 1) * n_bins]
            terms_re[s] = yr if s not in terms_re else terms_re[s] + yr
            terms_im[s] = yi if s not in terms_im else terms_im[s] + yi

    order = sorted(terms_re)
    re = terms_re[order[0]]
    im = terms_im[order[0]]
    for s in order[1:]:
        re = re + terms_re[s]
        im = im + terms_im[s]
    return re * re + im * im


def _signal_slices(xn: jnp.ndarray, n_slices: int):
    """Exact 7-bit slicing of row-normalized values ``|xn| <= 1``: every
    op below is exact in f32 (power-of-two multiplies; trunc; Sterbenz
    subtraction of the integer part)."""
    out = []
    residual = xn
    for _ in range(n_slices):
        scaled = residual * SLICE_SCALE
        t = jnp.trunc(scaled)
        residual = scaled - t
        out.append(t)
    return out


def hp_rdft_power(
    frames: jnp.ndarray,
    fft_size: int,
    n_bins: int,
    n_slices: int = 5,
    max_pair_sum: int = 5,
    hann_windowed: bool = False,
) -> jnp.ndarray:
    """``|rfft(frames)|^2`` over the first ``n_bins`` bins to ~2^-30 of the
    frame amplitude, using only bf16 MXU matmuls. ``frames`` ``[..., fft]``
    float32; returns float32 power ``[..., n_bins]``.

    ``n_slices`` x-slices and matrix slices; slice pairs with
    ``i + j > max_pair_sum`` are dropped (their exact contribution is below
    ``K * 2^(-7*(max_pair_sum+2)+14)``). With ``hann_windowed=True`` the
    periodic Hann window is folded into the matrices in float64 and
    ``frames`` must be the RAW (unwindowed) samples.
    """
    cos_slices, msin_slices = _dft_matrix_slices(
        fft_size, n_bins, n_slices, hann_windowed
    )
    return _hp_power_from_slices(frames, cos_slices, msin_slices, n_bins,
                                 n_slices, max_pair_sum)


def _hp_power_from_slices(
    frames: jnp.ndarray,
    cos_slices,
    msin_slices,
    n_bins: int,
    n_slices: int,
    max_pair_sum: int,
) -> jnp.ndarray:
    x = frames.astype(jnp.float32)
    # per-row power-of-two scale so xn in [-1, 1]: exact exponent
    # extraction (bit ops) rather than the approximate VPU log2/exp2
    row_max = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    bits = jax.lax.bitcast_convert_type(jnp.maximum(row_max, 1e-38), jnp.int32)
    sigma = jax.lax.bitcast_convert_type(
        (jnp.minimum((bits >> 23) & 0xFF, 0xFD) + 1) << 23, jnp.float32
    )
    xn = x / sigma
    x_slices = _signal_slices(xn, n_slices)

    def two_sum(a, b):
        s = a + b
        bb = s - a
        err = (a - (s - bb)) + (b - bb)
        return s, err

    def components(cos_sl, sin_sl):
        """Compensated (hi, lo) float32 accumulation of slice-pair matmuls
        for BOTH DFT components at once.

        MXU shape: all cos planes and all sin planes are concatenated
        column-wise so each signal slice does ONE wide matmul
        ``[.., K] @ [K, 2*n_slices*n_bins]`` — fewer, fatter matmuls beat
        many narrow ones on the systolic array (a few i+j > max_pair_sum
        products are computed and discarded; cheap at these sizes).

        Same-scale pairs (i+j == s) are summed as plain f32 adds — their
        integer magnitudes keep those sums exact to ~2 ulp of 2^25, which
        the 128^-(s+2) scale renders negligible — then the <= 6 scaled
        group sums go through a short two-float chain, largest scale
        first. No float64 anywhere (works with jax_enable_x64 off).
        """
        n_sl = len(cos_sl)
        c_all = jnp.concatenate(
            [jnp.asarray(m, jnp.bfloat16) for m in (*cos_sl, *sin_sl)],
            axis=1,
        )
        groups_re, groups_im = {}, {}
        for i, xs in enumerate(x_slices):
            y_all = jnp.matmul(
                xs.astype(jnp.bfloat16), c_all,
                preferred_element_type=jnp.float32,
            )
            for j in range(n_sl):
                if i + j > max_pair_sum:
                    continue
                s = i + j
                yr = y_all[..., j * n_bins : (j + 1) * n_bins]
                yi = y_all[..., (n_sl + j) * n_bins : (n_sl + j + 1) * n_bins]
                groups_re[s] = yr if s not in groups_re else groups_re[s] + yr
                groups_im[s] = yi if s not in groups_im else groups_im[s] + yi

        def combine(groups):
            # 2^-7(s+2) is a power of two: the scale multiply is exact
            terms = [groups[s] * (SLICE_SCALE ** (-(s + 2)))
                     for s in sorted(groups)]
            hi = terms[0]
            lo = jnp.zeros_like(hi)
            for t in terms[1:]:
                hi, err = two_sum(hi, t)
                lo = lo + err
            return two_sum(hi, lo)  # renormalize

        return combine(groups_re), combine(groups_im)

    (re_hi, re_lo), (im_hi, im_lo) = components(cos_slices, msin_slices)
    # |v|^2 with the two-float cross term; powers are nonnegative so the
    # sum does not cancel. sigma^2 is a power of two (exact rescale).
    power = (
        re_hi * re_hi
        + im_hi * im_hi
        + 2.0 * (re_hi * re_lo + im_hi * im_lo)
    )
    return power * (sigma * sigma)
