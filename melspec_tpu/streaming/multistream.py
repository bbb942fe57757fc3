"""Vectorized streaming mel over many concurrent audio streams.

A serving deployment decodes hundreds of live streams at once. The
reference's streaming objects are one-stream-per-struct; here the carried
state is batched — ``hop_buf [S, fft]``, ``idx [S]`` — and one jitted step
advances every stream by one hop (masked, so ragged activity is fine).
The stream axis shards over a mesh with ``shard_map``/``jit`` shardings
exactly like the batch axis in ``parallel/sharding.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.config import MelConfig
from melspec_tpu.ops import dft
from melspec_tpu.ops.filterbank import mel_filterbank
from melspec_tpu.ops.windows import hann_periodic


class MultiStreamState(NamedTuple):
    hop_buf: jnp.ndarray  # [S, fft_size]
    idx: jnp.ndarray      # [S] samples seen per stream


class MultiStreamMel:
    """Whisper streaming mel for ``n_streams`` concurrent streams.

    - ``init()`` -> fresh state for all streams
    - ``push(state, chunks [S, hop], active [S])`` ->
      ``(state, mels [S, n_mels], valid [S])``: advances only the streams
      whose ``active`` flag is set; ``valid`` marks streams whose overlap
      window has filled AND were active this step.
    - ``reset(state, mask [S])`` -> state with masked streams re-zeroed
      (a stream ended; its slot is reused).
    """

    def __init__(self, config: MelConfig = MelConfig(), n_streams: int = 64,
                 dtype=jnp.float32, fft_impl: str = "rdft"):
        if fft_impl not in ("rdft", "bf3", "sig"):
            raise ValueError("fft_impl must be 'rdft', 'bf3' or 'sig'")
        self.config = config
        self.n_streams = n_streams
        self.dtype = dtype
        # "rdft": HIGHEST-precision f32 DFT matmuls (default — bit-parity
        # with StreamingMel; fastest on chip: the fft=400 DFT is small
        # enough that HIGHEST's extra MXU passes are cheaper than bf3's
        # extra elementwise slicing traffic). "bf3": rounded-bf16 slice
        # pairs with the window folded exactly — the batch pipeline's
        # headline numerics; picks when accuracy belongs to the bf3 error
        # class (~3e-6 JFK parity) rather than plain-f32's ~1e-5.
        self.fft_impl = fft_impl
        fft, n_mels = config.fft_size, config.n_mels
        half = fft // 2
        self.half = half
        filters = mel_filterbank(config.sampling_rate, fft, n_mels)
        self.filters_t = jnp.asarray(filters[:, :half].T, dtype=dtype)
        self.window = jnp.asarray(hann_periodic(fft), dtype=dtype)
        cos_m, msin_m = dft.rdft_matrices(fft, half)
        self.cos_m = jnp.asarray(cos_m, dtype=dtype)
        self.msin_m = jnp.asarray(msin_m, dtype=dtype)
        if fft_impl == "sig":
            # bulk pushes route through the fused signal-input kernel:
            # overlap-and-save framing happens IN the kernel (offset=hop
            # over concat(hop_buf, chunks)), bf2 mel numerics
            from melspec_tpu.ops.mel_kernel import (_sig_device_matrices,
                                                    sig_geometry)

            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError("fft_impl='sig' is float32-only")
            geom = sig_geometry(fft, config.hop_size, offset=config.hop_size)
            if geom is None:
                raise ValueError(
                    "no macro-row geometry for this (fft, hop) — use "
                    "fft_impl='rdft' or 'bf3'"
                )
            self._sig_geom = geom
            m_big, pair_i, _, mt_bf2, _, _, _, npack = _sig_device_matrices(
                fft, n_mels, float(config.sampling_rate), 3, 3, 2
            )
            self._sig_m_big, self._sig_pair_i = m_big, pair_i
            self._sig_mt, self._sig_npack = mt_bf2, npack

    def _power(self, frames: jnp.ndarray) -> jnp.ndarray:
        """``|rfft|^2`` of RAW (unwindowed) frames ``[..., fft]`` over the
        first ``fft//2`` bins, per the configured implementation."""
        if self.fft_impl == "bf3":
            from melspec_tpu.ops.hp_dft import bf3_rdft_power

            return bf3_rdft_power(
                frames.astype(jnp.float32), self.config.fft_size, self.half,
                hann_windowed=True,
            )
        hp = jax.lax.Precision.HIGHEST
        xw = frames * self.window
        re = jnp.matmul(xw, self.cos_m, precision=hp)
        im = jnp.matmul(xw, self.msin_m, precision=hp)
        return re * re + im * im

    def init(self) -> MultiStreamState:
        return MultiStreamState(
            hop_buf=jnp.zeros((self.n_streams, self.config.fft_size),
                              dtype=self.dtype),
            idx=jnp.zeros(self.n_streams, dtype=jnp.int32),
        )

    def step(self, state: MultiStreamState, chunks: jnp.ndarray,
             active: jnp.ndarray):
        """One unjitted push step — public so callers can wrap it in their
        own ``jax.jit`` with explicit shardings (see
        ``parallel.sharding.sharded_multistream``)."""
        if self.fft_impl == "sig":
            # the fused kernel only exists on the bulk path (it needs
            # frames to fold into macro-rows); silently serving rdft
            # numerics from a 'sig' instance here would let a
            # scan-vs-bulk differential compare two different error
            # classes — refuse instead
            raise NotImplementedError(
                "fft_impl='sig' supports only the bulk path "
                "(push_many(scan=False)); use 'rdft' or 'bf3' for "
                "per-hop/step/scan use"
            )
        hop = self.config.hop_size
        fft = self.config.fft_size

        shifted = jnp.concatenate(
            [state.hop_buf[:, hop:], chunks.astype(self.dtype)], axis=1
        )
        buf = jnp.where(active[:, None], shifted, state.hop_buf)
        # Saturating at fft_size (idx only feeds `valid = idx >= fft`), so a
        # long-lived int32 stream slot can never wrap negative.
        idx = jnp.minimum(
            state.idx + jnp.where(active, hop, 0).astype(state.idx.dtype), fft
        )

        from melspec_tpu.ops.spectrogram import (log_mel_from_power,
                                                  whisper_norm)

        log_mel = log_mel_from_power(self._power(buf), self.filters_t,
                                     self.dtype)
        mels = whisper_norm(log_mel, axis=-1)
        valid = active & (idx >= fft)
        return MultiStreamState(buf, idx), mels, valid

    @functools.partial(jax.jit, static_argnums=0)
    def _push_jit(self, state: MultiStreamState, chunks: jnp.ndarray,
                  active: jnp.ndarray):
        return self.step(state, chunks, active)

    def _flat_chunks(self, chunks: jnp.ndarray):
        """Normalize bulk chunks to ``(flat [S, H*hop], H)``. Flat is
        the serving fast path: a ``[S, H, hop]`` DEVICE array has a
        minor-dim tiling the ``[S, T]`` signal concat cannot reuse, so
        XLA retiles (copies) the whole tick input — measured 0.7 ms of
        the 256x500-hop source-rate tick (tools/resample_probe4.py).
        Flat in, that copy never exists; 3D still accepted everywhere
        for the reference-shaped API."""
        hop = self.config.hop_size
        if chunks.ndim == 3:
            s, h = chunks.shape[:2]
            return chunks.reshape(s, h * hop), h
        return chunks, chunks.shape[-1] // hop

    @functools.partial(jax.jit, static_argnums=0)
    def _push_many_both_jit(self, state: MultiStreamState,
                            chunks: jnp.ndarray, active: jnp.ndarray):
        """Bulk push returning BOTH the unnormalized log10 mel and the
        whisper-normalized mel: ``(state, log_mel, mels, valid)``. The
        serving tick's reference-parity wire record quantizes the
        UNNORMALIZED column (``src/wasm.rs:110-114`` — the ``norm_mel``
        call there is commented out) while the VAD protocol consumes the
        normalized frames; one program computes both (the norm is a cheap
        fused epilogue of the same log-mel). rdft/bf3 only: the sig
        kernel applies the whisper norm in-kernel and never exposes the
        log10 tensor."""
        if self.fft_impl == "sig":
            raise ValueError(
                "log10 records need fft_impl 'rdft' or 'bf3' (the sig "
                "kernel normalizes in-kernel)"
            )
        return self._push_many_core(state, chunks, active)

    @functools.partial(jax.jit, static_argnums=0)
    def _push_many_jit(self, state: MultiStreamState, chunks: jnp.ndarray,
                       active: jnp.ndarray):
        """Bulk push: ``H`` hops for every stream in ONE framed matmul
        pipeline — H hops of overlap-and-save are exactly batch framing
        over ``concat(hop_buf, chunks)`` at offset ``hop`` (see
        ``StreamingMel._bulk``), so the MXU sees ``[S, H, fft]`` frames at
        once instead of H sequential [S, fft] steps."""
        if self.fft_impl == "sig":
            from melspec_tpu.ops.mel_kernel import _pallas_sig_mel

            hop = self.config.hop_size
            fft = self.config.fft_size
            chunks, h = self._flat_chunks(chunks)
            s = chunks.shape[0]
            # right-pad T to a 128-multiple inside the SAME concat (no
            # extra copy): makes the bulk flat-input-eligible
            # (mel_kernel._sig_flat_geometry needs T % 128 == 0), which
            # skips the whole-signal macro-row relayout when S % 8 == 0.
            # Frames start at p*hop + offset, so a right pad shifts
            # nothing; the hop_buf slice below ends at h*hop + fft <= T.
            t_raw = fft + h * hop
            pad = (-t_raw) % 128
            parts = [state.hop_buf, chunks.astype(self.dtype)]
            if pad:
                parts.append(jnp.zeros((s, pad), self.dtype))
            signal = jnp.concatenate(parts, axis=1)
            row_w, phases, rows_tile = self._sig_geom
            mels = _pallas_sig_mel(
                signal.astype(jnp.float32), self._sig_m_big, self._sig_mt,
                interpret=jax.default_backend() not in ("tpu", "gpu"),
                ks=3, pair_i=self._sig_pair_i, n_frames=h, offset=hop,
                mel_precision="bf2", n_mels_out=self.config.n_mels,
                row_w=row_w, phases=phases, rows_tile=rows_tile, pack=fft,
                npack=self._sig_npack,
            ).astype(self.dtype)
            hops = (jnp.arange(1, h + 1) * hop).astype(state.idx.dtype)
            valid = active[:, None] & ((state.idx[:, None] + hops[None, :])
                                       >= fft)
            new_buf = jnp.where(active[:, None],
                                signal[:, h * hop : h * hop + fft],
                                state.hop_buf)
            new_idx = jnp.where(
                active, jnp.minimum(state.idx + h * hop, fft), state.idx
            )
            return MultiStreamState(new_buf, new_idx), mels, valid
        state, _log_mel, mels, valid = self._push_many_core(state, chunks,
                                                            active)
        return state, mels, valid

    def _push_many_core(self, state: MultiStreamState, chunks: jnp.ndarray,
                        active: jnp.ndarray):
        """Shared bulk-push body for the XLA (rdft/bf3) paths:
        ``(state, log_mel, mels, valid)`` — see ``_push_many_jit`` for the
        framing argument and ``_push_many_both_jit`` for why the
        unnormalized log-mel is exposed."""
        from melspec_tpu.ops.spectrogram import (log_mel_from_power,
                                                 whisper_norm)
        from melspec_tpu.ops import framing as _framing

        hop = self.config.hop_size
        fft = self.config.fft_size
        chunks, h = self._flat_chunks(chunks)
        chunks = chunks.astype(self.dtype)
        # only the first ceil(fft/hop)-1 frames' windows reach into the
        # carried hop_buf; every later frame lies entirely inside this
        # push's chunks. Splitting the framing there keeps the signal
        # concat to a [S, fft + n_head*hop] sliver instead of
        # materializing concat(hop_buf, chunks) — ~245 MB of pure copy
        # behind the tick input / resampler output at 256x500 hops
        # (copy.14 / pad_maximum_fusion, tools/resample_probe4.py). The
        # window values and per-frame dots are identical, so this is a
        # layout change, not a numerics change (bulk-vs-scan stays at
        # 1e-12).
        n_head = -(-fft // hop) - 1
        if h > n_head > 0:
            head_sig = jnp.concatenate(
                [state.hop_buf, chunks[:, : n_head * hop]], axis=1)
            fr_head = _framing.frame_signal(head_sig, fft, hop, n_head,
                                            offset=hop)
            off = (n_head + 1) * hop - fft  # >= 0 by choice of n_head
            fr_tail = _framing.frame_signal(chunks, fft, hop,
                                            h - n_head, offset=off)
            power = jnp.concatenate(
                [self._power(fr_head), self._power(fr_tail)], axis=-2)
            new_tail = chunks[:, h * hop - fft :]
        else:
            signal = jnp.concatenate([state.hop_buf, chunks], axis=1)
            frames = _framing.frame_signal(signal, fft, hop, h,
                                           offset=hop)
            power = self._power(frames)
            new_tail = signal[:, h * hop : h * hop + fft]
        log_mel = log_mel_from_power(power, self.filters_t, self.dtype)
        mels = whisper_norm(log_mel, axis=-1)
        hops = (jnp.arange(1, h + 1) * hop).astype(state.idx.dtype)
        valid = active[:, None] & ((state.idx[:, None] + hops[None, :])
                                   >= fft)
        new_buf = jnp.where(active[:, None], new_tail, state.hop_buf)
        new_idx = jnp.where(
            active, jnp.minimum(state.idx + h * hop, fft), state.idx
        )
        return MultiStreamState(new_buf, new_idx), log_mel, mels, valid

    @functools.partial(jax.jit, static_argnums=0)
    def _push_many_scan(self, state: MultiStreamState, chunks: jnp.ndarray,
                        active: jnp.ndarray):
        """Per-hop lax.scan reference path (differential testing + the
        bench baseline the bulk path is measured against)."""
        if chunks.ndim == 2:  # flat bulk layout -> per-hop steps
            flat, h = self._flat_chunks(chunks)
            chunks = flat.reshape(chunks.shape[0], h,
                                  self.config.hop_size)

        def body(carry, chunk):
            carry, mels, valid = self.step(carry, chunk, active)
            return carry, (mels, valid)

        state, (mels, valid) = jax.lax.scan(
            body, state, jnp.swapaxes(chunks, 0, 1)
        )
        return state, jnp.swapaxes(mels, 0, 1), jnp.swapaxes(valid, 0, 1)

    def push_many(self, state: MultiStreamState, chunks, active=None,
                  scan: bool = False
                  ) -> Tuple[MultiStreamState, np.ndarray, np.ndarray]:
        """Push ``H`` hops per stream in one dispatch — ``[S, H, hop]``
        or the flat fast-path layout ``[S, H*hop]`` (see
        ``_flat_chunks``); returns ``(state, mels [S, H, n_mels],
        valid [S, H])``. ``active`` is per-stream: inactive streams keep
        their state and emit only invalid frames."""
        chunks = jnp.asarray(chunks, self.dtype)
        hop = self.config.hop_size
        ok = (chunks.shape[0] == self.n_streams) and (
            (chunks.ndim == 3 and chunks.shape[2] == hop)
            or (chunks.ndim == 2 and chunks.shape[1] % hop == 0)
        )
        if not ok:
            raise ValueError(
                "chunks must be [n_streams, n_hops, hop_size] or flat "
                "[n_streams, n_hops*hop_size]")
        n_hops = (chunks.shape[1] if chunks.ndim == 3
                  else chunks.shape[1] // hop)
        if n_hops == 0:  # empty push is a no-op on both paths
            return (state,
                    np.zeros((self.n_streams, 0, self.config.n_mels),
                             np.float32),
                    np.zeros((self.n_streams, 0), bool))
        if active is None:
            active = jnp.ones(self.n_streams, dtype=bool)
        fn = self._push_many_scan if scan else self._push_many_jit
        state, mels, valid = fn(state, chunks, jnp.asarray(active, bool))
        # one device_get: per-array fetches pay a round trip each on
        # remote runtimes
        return (state, *jax.device_get((mels, valid)))

    def push(self, state: MultiStreamState, chunks, active=None
             ) -> Tuple[MultiStreamState, np.ndarray, np.ndarray]:
        chunks = jnp.asarray(chunks, self.dtype)
        if chunks.shape != (self.n_streams, self.config.hop_size):
            raise ValueError("chunks must be [n_streams, hop_size]")
        if active is None:
            active = jnp.ones(self.n_streams, dtype=bool)
        state, mels, valid = self._push_jit(state, chunks,
                                            jnp.asarray(active, bool))
        return (state, *jax.device_get((mels, valid)))

    @functools.partial(jax.jit, static_argnums=0)
    def _reset_jit(self, state: MultiStreamState, mask: jnp.ndarray):
        return MultiStreamState(
            hop_buf=jnp.where(mask[:, None], 0.0, state.hop_buf),
            idx=jnp.where(mask, 0, state.idx),
        )

    def reset(self, state: MultiStreamState, mask) -> MultiStreamState:
        return self._reset_jit(state, jnp.asarray(mask, bool))
