"""Batched ON-DEVICE streaming resampler for many concurrent streams.

``examples/serve_streams.py`` resamples each client on the HOST (one
``ops.resample.StreamingResampler`` per recv thread) — fine for a demo,
but at hundreds of streams the per-sample FIR work lands on the single
serving core. The TPU-native shape is the same as the rest of the
serving tick (``streaming/serving.py``): carry the per-stream input tail
as batched device state and advance ALL streams with one framed matmul
per tick, so ingest rate conversion rides the same dispatch as
mel/VAD/quant.

Design notes (mirrors ``MultiStreamMel``'s carried-pytree protocol):

- State is ``buf [S, L]`` — the last ``L`` source-rate samples, seeded
  with zeros standing in for the offline op's left zero-extension. ``L``
  is chosen so (a) every tick consumes exactly the pushed samples
  (``L >= K - down``), (b) the window grid aligns with
  ``scipy.signal.resample_poly``'s (``L ≡ pad_left (mod down)``), and
  (c) the spurious leading outputs — windows that start before the
  offline op's first window — total an exact multiple of ``align`` (the
  downstream hop size), so a composed frontend's frame grid matches a
  host-resampled stream's exactly after skipping whole hops.
- A fresh stream's first :attr:`spurious_out` output samples are
  garbage by construction; composed consumers absorb them with the mel
  warmup counter (``SourceRateFrontend`` starts ``idx`` at
  ``-spurious_out``), standalone consumers drop them.
- Parity: real outputs (index >= ``spurious_out``) equal the host
  ``StreamingResampler``'s prefix output to f32 matmul associativity
  (test-enforced) — both paths share ``ops.resample._phase_matrix``.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.ops.resample import _lane_blocks, _phase_matrix

__all__ = ["MultiResampleState", "MultiStreamResampler"]


class MultiResampleState(NamedTuple):
    buf: jnp.ndarray  # [S, L] carried source-rate tail


class MultiStreamResampler:
    """Rational ``up/down`` resampling of ``S`` concurrent streams as one
    device step.

    - ``init()`` -> fresh state (all streams at their zero left-pad)
    - ``step(state, chunks [S, n], active [S])`` ->
      ``(state, y [S, n*up//down])`` — ``n`` must be a multiple of the
      reduced ``down``; inactive streams keep their state and their
      output lanes are meaningless (mask downstream, exactly like
      ``MultiStreamMel``).
    - ``reset(state, mask [S])`` -> masked streams back to stream start.

    The first :attr:`spurious_out` outputs of each stream's lifetime are
    garbage (see module docstring); with ``align`` set they total an
    exact multiple of ``align`` samples.
    """

    def __init__(self, up: int, down: int, n_streams: int = 16,
                 align: int = 1, beta: float = 5.0, impl: str = "auto",
                 precision: str = "highest"):
        g = math.gcd(up, down)
        up, down = up // g, down // g
        if up == down:
            raise ValueError("identity ratio: no resampler needed")
        if align < 1:
            raise ValueError("align must be >= 1")
        if impl not in ("auto", "conv", "frames", "kernel"):
            raise ValueError(
                "impl must be 'auto', 'conv', 'frames' or 'kernel'")
        if precision not in ("highest", "bf3"):
            raise ValueError("precision must be 'highest' or 'bf3'")
        # "bf3": 3-pass bf16-slice dots instead of HIGHEST's 6 passes —
        # measured 1.091 -> 0.664 ms device (1.64x) on the kernel path
        # at the 256x500-hop 48 k tick (tools/resample_bf3_ab.py), at
        # 7.1e-6 relative error vs HIGHEST (over the resampler's own
        # 2e-6 parity bar, far inside a mel consumer's 1e-5 class — the
        # same trade the mel kernels' default bf3 numerics make). The
        # XLA conv/frames fallbacks map it to lax.Precision.HIGH, the
        # compiler's name for the identical bf16_3x scheme.
        self.precision = precision
        # "kernel": the Pallas slab-DMA resampler (ops.resample.
        # pallas_resample) — every XLA formulation of the strided window
        # (conv, framed matmul, block matmul) pays a full-signal
        # relayout copy before the dot (~1.7 ms of the conv's 3.6 ms
        # device at the 256x500-hop tick; tools/resample_probe3.py),
        # which the kernel's in-VMEM window assembly avoids entirely.
        # "frames" (framed matmul) and "conv" (strided conv) remain as
        # the measured XLA alternatives and the fallback. "auto"
        # resolves at step time: kernel when the geometry qualifies and
        # an MXU backend is live, else conv.
        self.impl = impl
        self.up, self.down = up, down
        self.n_streams = n_streams
        self.beta = float(beta)
        g_np, r_lo = _phase_matrix(up, down, beta)
        self._k = g_np.shape[0]
        pad_left = -r_lo
        # smallest n_spur with L = pad_left + n_spur*down >= K - down and
        # n_spur*up ≡ 0 (mod align)  [grid + hop alignment, see module doc]
        step = align // math.gcd(up, align)  # n_spur granularity for
        # n_spur*up ≡ 0 (mod align)
        min_spur = max(0, -(-(self._k - down - pad_left) // down))
        if impl in ("auto", "kernel"):
            # the Pallas kernel's slab grid reads (nblk-1)*stride
            # samples past the last chunk boundary; carry enough tail
            # that the slab never overruns the concat. Growing n_spur by
            # whole `step`s preserves every grid/alignment invariant
            # (it only lengthens the documented spurious warm-up).
            from melspec_tpu.ops.resample import (kernel_block_m,
                                                  resample_kernel_geometry)

            m = kernel_block_m(up, down)
            geom = resample_kernel_geometry(up, down, m, beta)
            if geom is not None:
                _, stride, kb, nblk, _, _ = geom
                need = (nblk - 1) * stride
                min_spur = max(min_spur, -(-(need - pad_left) // down))
        n_spur = -(-min_spur // step) * step
        self._len = pad_left + n_spur * down
        self.spurious_out = n_spur * up

    def init(self) -> MultiResampleState:
        return MultiResampleState(
            buf=jnp.zeros((self.n_streams, self._len), jnp.float32)
        )

    def _block_m(self, q: int) -> int:
        """Largest lane-block count that divides this chunk's window
        count ``q``, capped by :func:`ops.resample._lane_blocks`'s
        bounded MXU target. ``q`` is static under jit, so the search
        runs once per traced shape."""
        cap = min(_lane_blocks(self.up, self.down), q)
        for m in range(cap, 1, -1):
            if q % m == 0:
                return m
        return 1

    def step(self, state: MultiResampleState, chunks: jnp.ndarray,
             active: jnp.ndarray):
        """One unjitted step (compose inside your own jit): consume
        ``chunks [S, n]`` source-rate samples, emit ``[S, n*up//down]``."""
        n = chunks.shape[-1]
        # n is static at trace time, so this guard is free under jit; a
        # silent floor would consume-but-never-filter n % down samples
        # and misalign every stream's window grid for its whole lifetime
        if n % self.down:
            raise ValueError(
                f"chunk length {n} must be a multiple of down={self.down}")
        q = n // self.down
        # MXU lane blocking, same construction as the offline
        # ``ops.resample.resample_poly``: fold ``m`` consecutive windows
        # into conv output channels so the conv runs with ``up*m >= 128``
        # output lanes even for pure decimation. The previous unblocked
        # form (``frame_signal`` -> ``[S, q, K] @ [K, up]``) left 127/128
        # MXU lanes idle for 48k->16k (up=1) AND materialized the frames
        # tensor (~5 GB per 256x500-hop tick) — measured 23k x RT for the
        # source-rate serving tick vs 326k for the plain tick
        # (BENCH_r03). The blocked strided conv materializes nothing; the
        # window set and per-output tap dots are IDENTICAL, so host
        # parity is unchanged up to f32 accumulation order.
        m = self._block_m(q)
        g_np, _ = _phase_matrix(self.up, self.down, self.beta, m)
        kb = g_np.shape[0]                  # (m-1)*down + K
        stride = m * self.down
        ch32 = chunks.astype(jnp.float32)
        impl = self.impl
        if impl in ("auto", "kernel"):
            from melspec_tpu.ops.resample import resample_kernel_geometry

            geom = resample_kernel_geometry(self.up, self.down, q,
                                            self.beta)
            backend_ok = jax.default_backend() in ("tpu", "gpu")
            eligible = ch32.shape[0] % 8 == 0 and geom is not None
            if impl == "kernel" and not eligible:
                raise ValueError(
                    "impl='kernel': no Pallas geometry for this "
                    "(ratio, chunk, n_streams) — use 'auto' to fall "
                    "back to the conv path")
            if impl == "kernel" or (eligible and backend_ok):
                from melspec_tpu.ops.resample import (pair_eligible,
                                                      pallas_resample,
                                                      pallas_resample_pair)

                if pair_eligible(self._len, n, self.up, self.down, q,
                                 self.beta):
                    # two-input slab kernel: the carried tail never gets
                    # concatenated onto the chunk signal, killing the
                    # full-signal HBM copy the concat materializes (~492
                    # MB behind the kernel at the 256x500-hop 48 k tick;
                    # bit-identical outputs, test_serving.py)
                    y = pallas_resample_pair(
                        state.buf, ch32, self.up, self.down, q,
                        self.beta,
                        precision=("bf3" if self.precision == "bf3"
                                   else None),
                        interpret=not backend_ok)
                    new_buf = jnp.where(active[:, None],
                                        ch32[:, n - self._len:],
                                        state.buf)
                    return MultiResampleState(new_buf), y
                sig = jnp.concatenate([state.buf, ch32], axis=-1)
                y = pallas_resample(sig, self.up, self.down, q,
                                    self.beta,
                                    precision=("bf3"
                                               if self.precision == "bf3"
                                               else None),
                                    interpret=not backend_ok)
                new_buf = jnp.where(active[:, None], sig[:, n:],
                                    state.buf)
                return MultiResampleState(new_buf), y
            impl = "conv"
        sig = jnp.concatenate([state.buf, ch32], axis=-1)
        if impl == "frames":
            from melspec_tpu.ops import framing

            qm = q // m
            kb_pad = -(-kb // 128) * 128
            needed = (qm - 1) * stride + kb_pad
            pad = max(0, needed - sig.shape[-1])
            sigp = jnp.pad(sig, ((0, 0), (0, pad))) if pad else sig
            frames = framing.frame_signal(sigp, kb_pad, stride, qm)
            rhs = jnp.asarray(
                np.pad(g_np, ((0, kb_pad - kb), (0, 0))), jnp.float32
            )                                              # [kb_pad, up*m]
            # padded tap rows are exact zeros — the extra window samples
            # (real future signal or the right zero pad) multiply them
            y = jnp.matmul(frames, rhs,
                           precision=(jax.lax.Precision.HIGH
                                      if self.precision == "bf3"
                                      else jax.lax.Precision.HIGHEST))
            y = y.reshape(sig.shape[0], q * self.up)
        else:
            # conv positions j cover windows [j*m, (j+1)*m); last window
            # ends at (q-1)*down + K == needed, and needed <= L + n
            # because the state length guarantees L >= K - down
            needed = (q // m - 1) * stride + kb
            lhs = sig[:, None, :needed]                    # [S, 1, T]
            rhs = jnp.asarray(g_np.T[:, None, :], jnp.float32)
            y = jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(stride,), padding=[(0, 0)],
                dimension_numbers=("NCW", "OIW", "NCW"),
                precision=(jax.lax.Precision.HIGH
                           if self.precision == "bf3"
                           else jax.lax.Precision.HIGHEST),
            )                                              # [S, up*m, q/m]
            # channel b*up + p of position j is output sample
            # (j*m+b)*up + p: transpose+reshape restores output order
            y = jnp.swapaxes(y, -1, -2).reshape(sig.shape[0], q * self.up)
        new_buf = jnp.where(active[:, None], sig[:, n:], state.buf)
        return MultiResampleState(new_buf), y

    @functools.partial(jax.jit, static_argnums=0)
    def _step_jit(self, state, chunks, active):
        return self.step(state, chunks, active)

    def push(self, state: MultiResampleState, chunks, active=None
             ) -> Tuple[MultiResampleState, np.ndarray]:
        chunks = jnp.asarray(chunks, jnp.float32)
        if chunks.ndim != 2 or chunks.shape[0] != self.n_streams:
            raise ValueError("chunks must be [n_streams, n]")
        if chunks.shape[1] % self.down:
            raise ValueError(
                f"chunk length must be a multiple of down={self.down}")
        if chunks.shape[1] == 0:
            return state, np.zeros((self.n_streams, 0), np.float32)
        if active is None:
            active = jnp.ones(self.n_streams, dtype=bool)
        state, y = self._step_jit(state, chunks, jnp.asarray(active, bool))
        return state, jax.device_get(y)

    @functools.partial(jax.jit, static_argnums=0)
    def _reset_jit(self, state, mask):
        return MultiResampleState(
            buf=jnp.where(mask[:, None], 0.0, state.buf)
        )

    def reset(self, state: MultiResampleState, mask) -> MultiResampleState:
        return self._reset_jit(state, jnp.asarray(mask, bool))
