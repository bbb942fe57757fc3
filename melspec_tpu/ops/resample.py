"""Polyphase sample-rate conversion, TPU-native.

Beyond-parity addition: the reference crate has no resampler — its browser
demo asks the AudioContext for 16 kHz and lets the browser resample
(``examples/browser/app.js`` here mirrors that), and every other entry
point assumes the configured rate.  Production serving ingests 8 kHz
telephony and 44.1/48 kHz sources, so melspec_tpu ships a TPU-native
rational resampler whose semantics match ``scipy.signal.resample_poly``
exactly (kaiser-5.0-windowed sinc, zero-phase, ``ceil(n*up/down)``
outputs, first output sample aligned with the first input sample, zero
signal extension at the edges).

TPU-first design: the polyphase identity

    y[q*up + p] = sum_r  x[q*down + r] * h[half_len + p*down - r*up]

says every block of ``up`` consecutive outputs is a fixed ``[K, up]``
matrix applied to a ``down``-strided window of the input.  We hand that
to the MXU as ONE strided convolution whose ``up`` output channels are
the polyphase branches (``lax.conv_general_dilated``, stride ``down``,
no dilation) — XLA lowers it to an implicit matmul, the filter matrix is
a host-built numpy constant, and memory overhead is O(1).  This performs
exactly the nonzero polyphase MACs, unlike the naive dilated-conv
formulation (``lhs_dilation=up`` with the ``2*10*max(up,down)+1``-tap
dilated filter — 8 821 taps for 44.1 kHz -> 16 kHz, mostly multiplied
against stuffed zeros) and unlike scipy's per-phase scalar FIR loops
(``upfirdn``'s C kernel).

The zero-phase alignment folds to a single constant: scipy's pre/post
filter padding bookkeeping reduces to ``y[n] = conv_full(h, upsample(x))
[half_len + n*down]`` — verified tap-for-tap in tests against scipy on
f64.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "MAX_MATRIX_ENTRIES",
    "StreamingResampler",
    "resample_filter",
    "resample_output_len",
    "resample_poly",
    "validate_ratio",
]

# The phase matrix holds K*up ~= up*down + 2*half_len f64 entries
# (half_len = 10*max(up, down)), so its host memory and build time scale
# with the REDUCED pair. Every standard audio-rate pair (8/11.025/16/
# 22.05/24/32/44.1/48/88.2/96/176.4/192 kHz against any other) reduces to
# <= 615,680 entries (11.025k <-> 32k); 2**20 (an 8 MB matrix) leaves
# headroom without admitting hostile ratios (44101/16000 is coprime:
# 7.1e8 entries, a 5.6 GB matrix).
MAX_MATRIX_ENTRIES = 1 << 20

# resample_poly's m-blocked variant scales the matrix by up to
# ~m^2*down/K beyond the m=1 bound above (m = ceil(128/up) lane blocks),
# so its m selection is SEPARATELY bounded: a ratio that passes
# validate_ratio must never explode only because the MXU wants full
# lanes. 2**22 f64 entries (32 MB) never binds for any standard rate
# pair (their blocked matrices stay <= ~0.5M entries) but caps e.g.
# up=1/down=49000 at m=2 (16 MB) instead of a 7.4 GB m=128 build.
MAX_BLOCKED_ENTRIES = 1 << 22


def _lane_blocks(up: int, down: int) -> int:
    """How many consecutive windows to fold into conv output channels
    (gcd-reduced ``up/down``): enough for >= 128 MXU lanes, halved until
    the blocked matrix fits :data:`MAX_BLOCKED_ENTRIES`."""
    half_len = 10 * max(up, down)
    k1 = ((up - 1) * down + half_len) // up + half_len // up + 1
    m = max(1, -(-128 // up))
    while m > 1 and ((m - 1) * down + k1) * up * m > MAX_BLOCKED_ENTRIES:
        m //= 2
    return m


def validate_ratio(up: int, down: int,
                   max_entries: int = MAX_MATRIX_ENTRIES
                   ) -> tuple[int, int]:
    """Gcd-reduce ``up/down`` and reject ratios unsafe to construct.

    Serving boundaries that accept a client-controlled rate MUST call
    this before constructing a resampler: ``_phase_matrix`` allocates the
    matrix in f64 host memory and caches it.  Returns the reduced
    ``(up, down)``; raises ``ValueError`` otherwise.
    """
    if up < 1 or down < 1:
        raise ValueError("up and down must be >= 1")
    g = math.gcd(up, down)
    up, down = up // g, down // g
    entries = up * down + 20 * max(up, down)
    if entries > max_entries:
        raise ValueError(
            f"resample ratio reduces to {up}/{down}: the polyphase matrix"
            f" would be ~{entries * 8 / 1e6:.0f} MB of host memory"
            f" (bound {max_entries * 8 / 1e6:.0f} MB); use a standard"
            f" rate pair")
    return up, down


def _kaiser_sinc_filter(half_len: int, cutoff: float, beta: float) -> np.ndarray:
    """Odd-length linear-phase lowpass: kaiser-windowed sinc, DC gain 1.

    Equivalent to ``scipy.signal.firwin(2*half_len+1, cutoff,
    window=("kaiser", beta))`` (cutoff in Nyquist units): windowed ideal
    lowpass, then scaled so the tap sum (the DC response) is exactly 1.
    Implemented with numpy only so the runtime never imports scipy.
    """
    n = np.arange(2 * half_len + 1, dtype=np.float64) - half_len
    taps = cutoff * np.sinc(cutoff * n) * np.kaiser(2 * half_len + 1, beta)
    return taps / taps.sum()


def resample_filter(up: int, down: int, beta: float = 5.0) -> np.ndarray:
    """The f64 anti-alias filter ``resample_poly`` uses, after gcd
    reduction of ``up/down`` — scipy's design: cutoff ``1/max(up,down)``
    of Nyquist, ``half_len = 10*max(up,down)``, kaiser(beta), scaled by
    ``up`` so passband gain survives the zero-stuffing."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    max_rate = max(up, down)
    return _kaiser_sinc_filter(10 * max_rate, 1.0 / max_rate, beta) * up


@lru_cache(maxsize=64)  # bounded: a serving boundary cycling through
# many distinct (validated) rates must not accumulate matrices without
# limit; jitted callers bake the matrix as a constant at trace time, so
# eviction only costs a rebuild on the next cold construction
def _phase_matrix(up: int, down: int, beta: float,
                  m: int = 1) -> tuple[np.ndarray, int]:
    """Host-built ``(G[K', up*m], r_lo)`` for gcd-reduced ``up/down``.

    With ``m == 1``: ``G[j, p] = h[half_len + p*down - (j + r_lo)*up]``
    (0 outside the filter support) — column ``p`` is phase ``p``'s FIR
    over the input window ``x[q*down + r_lo : q*down + r_lo + K]``.

    ``m > 1`` is the MXU lane-blocking variant: ``m`` consecutive
    windows become extra output channels (column ``b*up + p`` is phase
    ``p`` of window ``b``, its taps shifted by ``b*down``), so the conv
    runs with stride ``m*down`` and ``m*up ≥ 128`` channels.  The matrix
    is banded — ``((m-1)*down + K)/K``-fold more MACs than the
    unblocked form — but a 1-output-channel conv uses 1/128th of the
    MXU's lanes, so for small ``up`` (48 k->16 k is ``up=1``) blocking
    wins by an order of magnitude (measured on chip: 37 k-> >200 k x RT).
    """
    h = resample_filter(up, down, beta)
    half_len = (len(h) - 1) // 2
    # r bounds where 0 <= half_len + p*down - r*up <= 2*half_len for some p
    r_lo = -(half_len // up)                                  # p = 0
    r_hi = ((up - 1) * down + half_len) // up                 # p = up-1
    k = (m - 1) * down + r_hi - r_lo + 1
    g = np.zeros((k, up * m), dtype=np.float64)
    r = np.arange(r_lo, r_lo + k)
    for b in range(m):
        for p in range(up):
            idx = half_len + p * down - (r - b * down) * up
            valid = (idx >= 0) & (idx < len(h))
            g[valid, b * up + p] = h[idx[valid]]
    return g, r_lo


@lru_cache(maxsize=64)
def _phase_matrix_cast(up: int, down: int, beta: float,
                       dtype_str: str) -> tuple[np.ndarray, int]:
    """``_phase_matrix`` cast to the working dtype, cached: a serving
    boundary builds one ``StreamingResampler`` PER CLIENT, and a private
    0.3–2.5 MB f32 copy per connection is pure waste. The returned array
    is shared read-only — callers must never mutate it."""
    g, r_lo = _phase_matrix(up, down, beta)
    g = g.astype(dtype_str)
    g.setflags(write=False)
    return g, r_lo


def kernel_block_m(up: int, down: int) -> int:
    """Lane-block count the Pallas resample kernel uses for this
    (gcd-reduced) ratio: the smallest ``m`` whose window stride
    ``m*down`` is a 128-lane multiple (so slab DMA offsets and the
    in-VMEM ``[rows, stride]`` window reshape stay aligned) and whose
    ``m*up`` output channels fill the MXU's output lanes."""
    m = 128 // math.gcd(down, 128)
    while m * up < 128:
        m *= 2
    return m


def resample_kernel_geometry(up: int, down: int, q: int,
                             beta: float = 5.0):
    """Geometry for :func:`pallas_resample`, or ``None`` when this
    (ratio, window count) cannot ride the kernel: returns
    ``(m, stride, kb, nblk, ch, q_tile)``.

    Eligibility: the blocked window count ``q/m`` must be whole, and the
    concatenated block matrix must stay a sane VMEM resident (rejects
    e.g. 44.1 k's 441-sample hop, whose 128-aligned blocking would need
    a [56448, 40960] matrix — that ratio keeps the strided-conv path)."""
    m = kernel_block_m(up, down)
    if q % m:
        return None
    g_np, _ = _phase_matrix(up, down, beta, m)
    kb = g_np.shape[0]
    stride = m * down
    nblk = -(-kb // stride)
    ch = m * up
    if stride * nblk * ch * 4 > (2 << 20):  # gcat must live in VMEM
        return None
    big_q = q // m
    q_tile = 1
    cap = min(128, big_q, (3 << 20) // (64 * stride))
    for d in range(cap, 0, -1):
        if big_q % d == 0:
            q_tile = d
            break
    return m, stride, kb, nblk, ch, q_tile


def pallas_resample(sig: jnp.ndarray, up: int, down: int, q: int,
                    beta: float = 5.0,
                    precision=None,
                    interpret: bool = False) -> jnp.ndarray:
    """Polyphase resampling of ``sig [S, T]`` as ONE Pallas kernel:
    double-buffered contiguous slab DMA -> in-VMEM window reshape -> one
    MXU dot against the column-concatenated block matrices -> shifted
    block add, ``[S, q*up]`` out.

    Exists because every XLA formulation of the strided window pays a
    full-signal relayout: the strided conv measured 3.6 ms device at the
    256-stream serving tick, and the op-level trace of the best matmul
    rewrite (1.65-2.5 ms) shows ~1.7 ms of pure ``copy``/``slice`` —
    XLA must retile ``[S, T]`` to a ``[S, Q, stride]`` minor-dim layout
    before any dot (tools/resample_probe3.py). The kernel reads the raw
    signal once, assembles windows in VMEM for free, and writes exactly
    the output: ~0.35 ms of HBM traffic + the dot.

    Requirements (caller falls back to the conv path otherwise):
    ``S % 8 == 0``, a :func:`resample_kernel_geometry` hit, and
    ``T >= (q/m + nblk - 1) * stride``. Window ``w`` covers
    ``sig[:, w*down : w*down + kb]`` — the same grid as the conv path,
    so outputs are interchangeable (same tap dots; f32 accumulation
    order differs only by the zero-padded gcat rows, which add exact
    zeros).

    ``precision``: a ``jax.lax.Precision`` (default HIGHEST) or the
    string ``"bf3"`` — a manual 3-slice bf16 dot (Mosaic rejects
    ``Precision.HIGH``): measured 1.64x faster at the 256-stream
    serving shape at 7.1e-6 relative error (tools/resample_bf3_ab.py)."""
    geom = resample_kernel_geometry(up, down, q, beta)
    if geom is None:
        raise ValueError("no kernel geometry — use the conv path")
    m, stride, kb, nblk, ch, q_tile = geom
    s_all, t_src = sig.shape
    if s_all % 8:
        raise ValueError("pallas_resample needs S % 8 == 0")
    big_q = q // m
    n_s, n_t = s_all // 8, big_q // q_tile
    slab_w = (q_tile + nblk - 1) * stride
    if t_src < (big_q + nblk - 1) * stride:
        raise ValueError("signal shorter than the kernel's slab grid")

    gcat, bf3, precision = _kernel_gcat(up, down, beta, m, stride, kb,
                                        nblk, ch, precision)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_rows = q_tile + nblk - 1

    def kernel(sig_ref, gcat_ref, out_ref, slab, sems):
        s = pl.program_id(0)
        t = pl.program_id(1)
        n_tt = pl.num_programs(1)
        slot = (s * n_tt + t) % 2

        def dma(ss, tt, sl):
            return pltpu.make_async_copy(
                sig_ref.at[pl.ds(ss * 8, 8),
                           pl.ds(tt * (q_tile * stride), slab_w)],
                slab.at[sl], sems.at[sl],
            )

        @pl.when((s == 0) & (t == 0))
        def _():
            dma(0, 0, 0).start()

        nxt = s * n_tt + t + 1

        @pl.when(nxt < pl.num_programs(0) * n_tt)
        def _():
            dma(nxt // n_tt, nxt % n_tt, (slot + 1) % 2).start()

        dma(s, t, slot).wait()
        out_ref[:] = _slab_project(slab[slot], gcat_ref, bf3, precision,
                                   a_rows, stride, q_tile, nblk, ch)

    out = pl.pallas_call(
        kernel,
        grid=(n_s, n_t),
        out_shape=jax.ShapeDtypeStruct((s_all, big_q * ch), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, q_tile * ch), lambda s, t: (s, t)),
        scratch_shapes=[pltpu.VMEM((2, 8, slab_w), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(sig, gcat)
    return out  # [S, q*up]


def _kernel_gcat(up, down, beta, m, stride, kb, nblk, ch, precision):
    """The column-concatenated block matrix the slab kernels dot
    against, in the numerics the caller asked for: ``(gcat, bf3,
    precision)``."""
    g_np, _ = _phase_matrix(up, down, beta, m)
    gcat64 = np.zeros((stride, nblk * ch), np.float64)
    for b in range(nblk):
        rows = min(stride, kb - b * stride)
        gcat64[:rows, b * ch : (b + 1) * ch] = g_np[b * stride :
                                                    b * stride + rows]
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    bf3 = precision == "bf3"
    if bf3:
        # manual 3-slice bf16 dot (Mosaic rejects Precision.HIGH): the
        # K-concat [x0 | x0 | x1] @ [g0; g1; g0] accumulates the
        # (0,0),(0,1),(1,0) slice products in the MXU's f32 accumulator
        # — 3 bf16 passes instead of HIGHEST's 6, the dropped (1,1)
        # term is O(2^-32) relative (the mel kernels' established bf2/
        # bf3 scheme, ops/mel_kernel._sig_project)
        g0 = gcat64.astype(np.dtype("bfloat16"))
        g1 = (gcat64 - g0.astype(np.float64)).astype(np.dtype("bfloat16"))
        gcat = jnp.asarray(
            np.concatenate([np.asarray(g0, np.float32),
                            np.asarray(g1, np.float32),
                            np.asarray(g0, np.float32)], axis=0),
            jnp.bfloat16)
    else:
        gcat = jnp.asarray(gcat64, jnp.float32)
    return gcat, bf3, precision


def _slab_project(block, gcat_ref, bf3, precision, a_rows, stride,
                  q_tile, nblk, ch):
    """In-VMEM window reshape -> one MXU dot -> shifted block add over
    one ``[8, slab_w]`` slab (shared by both slab kernels; identical
    float ops regardless of which ref the slab was DMA'd from)."""
    x3 = block.reshape(8 * a_rows, stride)
    if bf3:
        x0 = x3.astype(jnp.bfloat16)
        x1 = (x3 - x0.astype(jnp.float32)).astype(jnp.bfloat16)
        xcat = jnp.concatenate([x0, x0, x1], axis=1)
        z = jax.lax.dot_general(
            xcat, gcat_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(8, a_rows, nblk * ch)
    else:
        z = jax.lax.dot_general(
            x3, gcat_ref[:], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32,
        ).reshape(8, a_rows, nblk * ch)
    y = z[:, :q_tile, :ch]
    for b in range(1, nblk):
        y = y + z[:, b : b + q_tile, b * ch : (b + 1) * ch]
    return y.reshape(8, q_tile * ch)


def pair_eligible(buf_len: int, n: int, up: int, down: int, q: int,
                  beta: float = 5.0) -> bool:
    """Whether :func:`pallas_resample_pair` accepts this shape (all
    static quantities — the check is free under jit). Mirrors the
    kernel's own guards plus the streaming step's ``n >= L`` tail-carry
    requirement; callers fall back to the concat form when False."""
    geom = resample_kernel_geometry(up, down, q, beta)
    if geom is None:
        return False
    m, stride, _, nblk, _, q_tile = geom
    big_q = q // m
    n_t = big_q // q_tile
    d = (-buf_len) % 128
    w_pad = (q_tile + nblk - 1) * stride + (128 if d else 0)
    if n < buf_len or buf_len + n < (big_q + nblk - 1) * stride:
        return False
    if n_t > 1 and (q_tile * stride < buf_len + d
                    or (n_t - 1) * q_tile * stride - buf_len - d + w_pad
                    > n):
        return False
    return True


def pallas_resample_pair(buf: jnp.ndarray, chunks: jnp.ndarray, up: int,
                         down: int, q: int, beta: float = 5.0,
                         precision=None,
                         interpret: bool = False) -> jnp.ndarray:
    """:func:`pallas_resample` over the VIRTUAL signal
    ``concat(buf, chunks)`` without ever materializing the concat.

    The streaming step's ``concat(state.buf [S, L], chunks [S, n])`` is
    pure HBM copy behind the kernel — ~492 MB (write + re-read ≈ 1 GB of
    traffic) at the 256-stream x 500-hop 48 k serving tick, all to
    prepend an L≈500-sample carried tail. Here only tile t=0's slab
    straddles the buf/chunks boundary, so that one ``[S, slab_w]`` slab
    (~50 MB at the tick shape) is assembled on the XLA side and every
    other tile DMAs straight out of ``chunks`` at offset
    ``t*q_tile*stride - L``. Slab contents — and therefore outputs — are
    BIT-identical to ``pallas_resample(concat(buf, chunks))``
    (test_serving.py pins this).

    Requires ``n >= L`` and, when the tile grid has more than one
    column, ``q_tile*stride >= L + 128`` plus ~128 samples of chunk
    slack past the grid end (so no t>0 slab re-enters ``buf`` and the
    aligned over-read below stays inside ``chunks``); callers fall back
    to the concat form otherwise (:func:`pair_eligible`).

    Alignment: Mosaic requires dynamic HBM slice offsets to be
    128-divisible on the lane axis, and the t>0 window start
    ``t*q_tile*stride - L`` generally is not (L is fixed by the filter
    grid + hop alignment; for 48 k->16 k its residue class mod 32 can
    never reach 0). But ``q_tile*stride`` IS a 128-multiple, so the
    misalignment ``d = (-L) % 128`` is one compile-time constant shared
    by every tile: each DMA reads from the aligned offset
    ``t*q_tile*stride - L - d`` with 128 extra lanes, and the kernel
    skips ``d`` lanes with a STATIC slice (a lane rotation, no
    divisibility proof needed). The first slab gets ``d`` dummy zeros
    prepended host-side so all tiles share the same in-slab offset."""
    geom = resample_kernel_geometry(up, down, q, beta)
    if geom is None:
        raise ValueError("no kernel geometry — use the conv path")
    m, stride, kb, nblk, ch, q_tile = geom
    s_all, buf_len = buf.shape
    if chunks.shape[0] != s_all:
        raise ValueError("buf and chunks must share the stream axis")
    if s_all % 8:
        raise ValueError("pallas_resample needs S % 8 == 0")
    n = chunks.shape[1]
    big_q = q // m
    n_s, n_t = s_all // 8, big_q // q_tile
    slab_w = (q_tile + nblk - 1) * stride
    d = (-buf_len) % 128
    w_pad = slab_w + (128 if d else 0)
    if buf_len + n < (big_q + nblk - 1) * stride:
        raise ValueError("signal shorter than the kernel's slab grid")
    if n_t > 1 and (q_tile * stride < buf_len + d
                    or (n_t - 1) * q_tile * stride - buf_len - d + w_pad
                    > n):
        raise ValueError(
            "tile grid re-enters the carried buffer or over-reads the "
            "chunk tail — use pallas_resample over the concat")

    gcat, bf3, precision = _kernel_gcat(up, down, beta, m, stride, kb,
                                        nblk, ch, precision)
    head = min(max(w_pad - d - buf_len, 0), n)
    first = jnp.concatenate(
        [jnp.zeros((s_all, d), jnp.float32), buf.astype(jnp.float32),
         chunks[:, :head].astype(jnp.float32)],
        axis=1)[:, :w_pad]
    if first.shape[1] < w_pad:  # short chunk: the trailing lanes sit
        # past the slab grid's last window (guaranteed by the grid-length
        # check above), so zero fill is never read by the dot
        first = jnp.pad(first, ((0, 0), (0, w_pad - first.shape[1])))
    chunks = chunks.astype(jnp.float32)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_rows = q_tile + nblk - 1

    def kernel(first_ref, chk_ref, gcat_ref, out_ref, slab, sems):
        s = pl.program_id(0)
        t = pl.program_id(1)
        n_tt = pl.num_programs(1)
        slot = (s * n_tt + t) % 2

        def start_dma(ss, tt, sl):
            # tile 0 straddles the buf/chunks boundary and reads the
            # host-assembled first slab; every later tile reads chunks
            # directly from the 128-ALIGNED offset t*q_tile*stride-L-d
            # (eligibility above guarantees it is inside chunks, and a
            # multi-tile grid implies n >= w_pad so the slice shape is
            # valid at trace time — the branch is statically absent when
            # the grid has one column). Both branches move the same
            # 8 x w_pad block into slab[sl], so one canonical descriptor
            # below can wait for either.
            @pl.when(tt == 0)
            def _():
                pltpu.make_async_copy(
                    first_ref.at[pl.ds(ss * 8, 8), pl.ds(0, w_pad)],
                    slab.at[sl], sems.at[sl]).start()

            if n_t > 1:
                @pl.when(tt > 0)
                def _():
                    # offset expressed as (lanes/128)*128 so Mosaic's
                    # divisibility prover sees the 128-multiple
                    # syntactically (tt*qs - (L+d) is one mod-derived
                    # i32 it cannot analyze)
                    off = (tt * (q_tile * stride // 128)
                           - (buf_len + d) // 128) * 128
                    pltpu.make_async_copy(
                        chk_ref.at[pl.ds(ss * 8, 8), pl.ds(off, w_pad)],
                        slab.at[sl], sems.at[sl]).start()

        @pl.when((s == 0) & (t == 0))
        def _():
            start_dma(s, t, 0)

        nxt = s * n_tt + t + 1

        @pl.when(nxt < pl.num_programs(0) * n_tt)
        def _():
            start_dma(nxt // n_tt, nxt % n_tt, (slot + 1) % 2)

        pltpu.make_async_copy(
            first_ref.at[pl.ds(s * 8, 8), pl.ds(0, w_pad)],
            slab.at[slot], sems.at[slot]).wait()
        # skip the d junk lanes with a STATIC slice (lane rotation)
        block = slab[slot][:, d : d + slab_w] if d else slab[slot]
        out_ref[:] = _slab_project(block, gcat_ref, bf3, precision,
                                   a_rows, stride, q_tile, nblk, ch)

    out = pl.pallas_call(
        kernel,
        grid=(n_s, n_t),
        out_shape=jax.ShapeDtypeStruct((s_all, big_q * ch), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, q_tile * ch), lambda s, t: (s, t)),
        scratch_shapes=[pltpu.VMEM((2, 8, w_pad), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(first, chunks, gcat)
    return out  # [S, q*up]


def resample_output_len(n_in: int, up: int, down: int) -> int:
    """``ceil(n_in * up / down)`` after gcd reduction (scipy's rule)."""
    g = math.gcd(up, down)
    up, down = up // g, down // g
    return -(-(n_in * up) // down)


def resample_poly(
    x: jnp.ndarray,
    up: int,
    down: int,
    beta: float = 5.0,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Resample ``x [..., N]`` by the rational factor ``up/down``.

    Matches ``scipy.signal.resample_poly(x, up, down, axis=-1)`` (its
    default kaiser-5.0 design, ``padtype="constant"``): output length
    ``ceil(N*up/down)``, zero-phase, edges treated as zero.  Static
    shapes throughout — jit/vmap/shard_map friendly.  Integer input is
    resampled in float32 (like scipy's int path filters in float).
    """
    if up < 1 or down < 1:
        raise ValueError("up and down must be >= 1")
    gcd = math.gcd(up, down)
    up, down = up // gcd, down // gcd
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(jnp.float32)
    if up == down:
        return x
    n_in = x.shape[-1]
    n_out = -(-(n_in * up) // down)
    if n_in == 0:
        return jnp.zeros(x.shape[:-1] + (0,), dtype=x.dtype)

    # lane blocking: give the conv >= 128 output channels (m consecutive
    # windows as extra channels) so the MXU's output lanes are full even
    # for pure decimation (up=1) — bounded so a validated ratio can never
    # trigger a multi-GB blocked-matrix build (MAX_BLOCKED_ENTRIES)
    m = _lane_blocks(up, down)
    g_np, r_lo = _phase_matrix(up, down, beta, m)
    k = g_np.shape[0]
    ch, stride = up * m, down * m
    q = -(-n_out // ch)  # strided-conv positions: each yields `ch` outputs
    # conv window q covers padded indices [q*stride, q*stride + K'); the
    # padded signal is  (-r_lo) zeros | x | right zeros
    pad_left = -r_lo
    needed = (q - 1) * stride + k
    pad_right = max(0, needed - pad_left - n_in)
    batch_shape = x.shape[:-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_left, pad_right)])
    lhs = xp.reshape(-1, 1, xp.shape[-1])[..., :needed]    # [B, 1, L]
    rhs = jnp.asarray(g_np.T[:, None, :], dtype=x.dtype)   # [ch, 1, K']
    y = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=precision,
    )                                                      # [B, ch, Q]
    y = jnp.swapaxes(y, -1, -2).reshape(batch_shape + (q * ch,))
    return y[..., :n_out]


class StreamingResampler:
    """Chunked resampler for serving ingest: push arbitrary-length chunks
    at the source rate, receive the same samples the offline
    :func:`resample_poly` would produce (prefix parity up to float
    associativity; test-enforced), with :meth:`flush` emitting the
    zero-extended tail and resetting for the next stream.

    Host-side numpy by design: serving ingest handles per-client chunks
    of a few hundred samples, where a device round trip costs more than
    the ~``K*up/down`` MACs per sample; the batched device tick
    downstream stays unchanged.  The SAME ``_phase_matrix`` drives both
    paths, so parity is structural.

    State is ``O(K)``: the input tail from the next conv window's start,
    plus the emitted/consumed counts.
    """

    def __init__(self, up: int, down: int, beta: float = 5.0,
                 dtype=np.float32):
        if up < 1 or down < 1:
            raise ValueError("up and down must be >= 1")
        gcd = math.gcd(up, down)
        self.up, self.down = up // gcd, down // gcd
        self._dtype = np.dtype(dtype)
        if self.identity:
            self._n_in = 0
            return
        self._g, r_lo = _phase_matrix_cast(self.up, self.down, beta,
                                           self._dtype.name)
        self._k = self._g.shape[0]
        self._pad_left = -r_lo
        # buffer starts at padded index q_next*down; seed the left zero pad
        self._buf = np.zeros(self._pad_left, dtype=dtype)
        self._n_in = 0
        self._n_emitted = 0

    @property
    def identity(self) -> bool:
        return self.up == self.down

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Consume ``chunk [n]``; return every output sample now fully
        determined by the input seen so far."""
        chunk = np.asarray(chunk, dtype=self._dtype)
        if chunk.ndim != 1:
            raise ValueError("chunk must be 1-D")
        self._n_in += len(chunk)
        if self.identity:
            return chunk
        self._buf = np.concatenate([self._buf, chunk])
        return self._drain()

    def flush(self) -> np.ndarray:
        """Emit the remaining outputs for the stream seen so far (zero
        signal extension, like offline's right edge), then reset for a
        new stream."""
        if self.identity:
            self._n_in = 0
            return np.zeros(0, dtype=self._dtype)
        n_out = resample_output_len(self._n_in, self.up, self.down)
        limit = n_out - self._n_emitted
        q_rem = -(-limit // self.up)
        needed = (q_rem - 1) * self.down + self._k if q_rem > 0 else 0
        if needed > len(self._buf):
            pad = np.zeros(needed - len(self._buf), dtype=self._dtype)
            self._buf = np.concatenate([self._buf, pad])
        out = self._drain(limit=limit)
        self._buf = np.zeros(self._pad_left, dtype=self._dtype)
        self._n_in = 0
        self._n_emitted = 0
        return out

    def _drain(self, limit: int | None = None) -> np.ndarray:
        avail = len(self._buf)
        q = (avail - self._k) // self.down + 1 if avail >= self._k else 0
        if limit is not None:
            q = min(q, -(-limit // self.up))
        if q <= 0:
            return np.zeros(0, dtype=self._dtype)
        # same windows + same per-row dots as the offline conv
        stride = self._buf.strides[0]
        frames = np.lib.stride_tricks.as_strided(
            self._buf, (q, self._k), (self.down * stride, stride))
        y = frames @ self._g
        self._buf = self._buf[q * self.down:].copy()
        out = y.reshape(-1)
        if limit is not None:
            out = out[:limit]
        self._n_emitted += len(out)
        return out
