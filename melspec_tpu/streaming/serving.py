"""Fully on-device serving tick: mel + streaming VAD + per-frame quant.

The reference's live path runs per stream and per hop on the host/WASM
side: the browser worker pops one hop of PCM, computes one mel column,
feeds it to the ``VoiceActivityDetector``, quantizes, and packs a wire
record (``examples/browser/worker.js:42-61``, ``src/wasm.rs:95-145``,
``src/vad.rs:137-205``). On TPU the right shape is the transpose: ONE
jitted dispatch advances all ``S`` streams by ``H`` hops —

- bulk framed-matmul mel (``streaming/multistream.py``),
- the streaming-VAD decision protocol batched over a carried
  last-``(min_x-1)``-frames history per stream (``MultiStreamVad``), and
- per-frame u8 min/max quantization (``ops/quant.quantize_frames_jnp``,
  bit-exact with the host quantizer)

— so the host's per-record work reduces to byte packing, and the device
fetch per frame is ``n_mels`` bytes + two f32 + one bool instead of
``n_mels`` float32s plus host-side VAD and quantization math.
"""

from __future__ import annotations

import functools
import sys
import time
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from melspec_tpu.config import DetectionSettings, MelConfig
from melspec_tpu.ops.quant import quantize_frames_jnp
from melspec_tpu.ops.vad import streaming_decision_fields_batched
from melspec_tpu.streaming.multistream import MultiStreamMel, MultiStreamState
from melspec_tpu.streaming.resample import MultiResampleState
from melspec_tpu.streaming.state_io import (load_stream_state,
                                            save_stream_state)


def _frontend_meta(front: "MultiStreamFrontend") -> dict:
    cfg, s = front.config, front.vad.settings
    return {
        "kind": "MultiStreamFrontend",
        "n_streams": front.n_streams,
        "fft_size": cfg.fft_size, "hop_size": cfg.hop_size,
        "n_mels": cfg.n_mels, "sampling_rate": float(cfg.sampling_rate),
        "dtype": jnp.dtype(front.mel.dtype).name,
        "fft_impl": front.mel.fft_impl, "record_norm": front.record_norm,
        "vad": [float(s.min_energy), s.min_y, s.min_x, s.min_mel],
    }


class VadStreamState(NamedTuple):
    """Carried device state of the batched streaming VAD: the last
    ``min_x - 1`` REAL mel frames per stream (tail-aligned; leading slots
    are zero until enough frames arrived) and the saturating count of
    real frames seen."""

    hist: jnp.ndarray   # [S, min_x - 1, n_mels] float32
    count: jnp.ndarray  # [S] int32, saturates at min_x


class MultiStreamVad:
    """Batched, device-resident equivalent of feeding each stream's
    ``VoiceActivityDetector`` (``streaming/vad.py``, reference
    ``src/vad.rs:137-205``) its valid mel frames in order.

    The protocol's decision at frame ``t`` classifies the window of the
    last ``min_x`` frames only, so the carried state per stream is just
    the previous ``min_x - 1`` frames; a push of ``H`` new frames
    computes all ``H`` decisions with one batched
    ``streaming_decision_fields_batched`` call over
    ``concat(hist, new)``. Decisions where the window is not yet full of
    real frames are ``False`` — exactly the host detector's ``None``
    (the wire record's ``va=0``).

    Structural assumption (matches ``MultiStreamMel``): within one push,
    a stream's invalid frames form a PREFIX (warm-up) — ``valid`` is
    ``active & (samples_seen >= fft)`` and never un-sets while active;
    a reused slot must be ``reset`` (which also clears this state).
    """

    def __init__(self, settings: DetectionSettings = DetectionSettings(),
                 n_streams: int = 16, n_mels: int = 80):
        if settings.min_x < 3:
            raise ValueError("streaming VAD needs min_x >= 3")
        if n_mels < 3:
            raise ValueError("Sobel VAD needs n_mels >= 3")
        self.settings = settings
        self.n_streams = n_streams
        self.n_mels = n_mels

    def init(self) -> VadStreamState:
        k = self.settings.min_x - 1
        return VadStreamState(
            hist=jnp.zeros((self.n_streams, k, self.n_mels), jnp.float32),
            count=jnp.zeros(self.n_streams, jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _push_jit(self, state: VadStreamState, mels: jnp.ndarray,
                  valid: jnp.ndarray):
        settings = self.settings
        min_x = settings.min_x
        k = min_x - 1
        s, h, _ = mels.shape

        seq = jnp.concatenate([state.hist, mels.astype(jnp.float32)],
                              axis=1)                      # [S, k+H, M]
        # image layout [S, M, T] for the Sobel classification: a
        # transpose-free time-major variant was measured SLOWER on TPU
        # (201k vs 290k x RT for the full tick at 256sx500h) — the
        # per-column count becomes a 128-lane reduction per element and
        # the min_mel slice goes lane-misaligned, which costs more than
        # the whole-mel transpose it saves. Time stays on lanes.
        img = jnp.swapaxes(seq, -1, -2)                    # [S, M, k+H]
        fields = streaming_decision_fields_batched(img, settings)

        # a decision is real exactly when its min_x-frame window holds
        # only real frames: count prior real frames + valid new frames up
        # to and including this one >= min_x (see the prefix-invalidity
        # assumption in the class docstring)
        cumv = jnp.cumsum(valid.astype(jnp.int32), axis=1)  # [S, H]
        warmed = (state.count[:, None] + cumv) >= min_x
        va = fields["active"] & valid & warmed              # [S, H]

        # history update: the last k REAL frames. Eligible frames are the
        # k hist slots followed by the v valid new frames (the invalid
        # prefix, present only during warm-up, is skipped); element
        # j of that eligible list lives at seq position j for j < k and
        # k + (H - v) + (j - k) after the gap. The new history is
        # eligible elements v .. v+k-1 — tail-aligned, zeros ahead.
        # dtype pinned: under x64, sum(int32) accumulates to int64, which
        # would drift the carried count's dtype across pushes
        v = jnp.sum(valid, axis=1, dtype=state.count.dtype)  # [S]
        j = v[:, None] + jnp.arange(k)[None, :]             # [S, k]
        pos = jnp.where(j < k, j, (h - v)[:, None] + j)     # [S, k]
        hist = jnp.take_along_axis(seq, pos[:, :, None], axis=1)
        count = jnp.minimum(state.count + v,
                            jnp.asarray(min_x, state.count.dtype))
        return VadStreamState(hist, count), va

    def push(self, state: VadStreamState, mels, valid
             ) -> Tuple[VadStreamState, np.ndarray]:
        """``mels [S, H, n_mels]``, ``valid [S, H]`` ->
        ``(state, va [S, H] bool)``."""
        mels = jnp.asarray(mels)
        if mels.ndim != 3 or mels.shape[0] != self.n_streams:
            raise ValueError("mels must be [n_streams, n_hops, n_mels]")
        if mels.shape[1] == 0:
            return state, np.zeros((self.n_streams, 0), bool)
        state, va = self._push_jit(state, mels, jnp.asarray(valid, bool))
        return state, jax.device_get(va)

    @functools.partial(jax.jit, static_argnums=0)
    def _reset_jit(self, state: VadStreamState, mask: jnp.ndarray):
        return VadStreamState(
            hist=jnp.where(mask[:, None, None], 0.0, state.hist),
            count=jnp.where(mask, 0, state.count),
        )

    def reset(self, state: VadStreamState, mask) -> VadStreamState:
        return self._reset_jit(state, jnp.asarray(mask, bool))


class FrontendState(NamedTuple):
    mel: MultiStreamState
    vad: VadStreamState


class MultiStreamFrontend:
    """The whole serving tick — mel, VAD decision, 8-bit quantization —
    for ``S`` concurrent streams in ONE device dispatch.

    ``push_many(state, chunks [S, H, hop], active [S])`` returns
    ``(state, q [S, H, n_mels] u8, lo [S, H], hi [S, H], va [S, H],
    valid [S, H])`` — everything a serving loop needs to pack the
    reference browser worker's wire record
    (``u32 idx | u8 va | f32 min | f32 max | u8[n_mels]``,
    ``examples/browser/worker.js:52-58``) without touching the float
    mel on the host.

    ``record_norm`` picks the units of the quantized payload:
    ``"whisper"`` (default) quantizes the whisper-NORMALIZED mel — a
    deliberate divergence from the reference wire record (documented in
    ``docs/PARITY.md``): the dequantized frames feed ``set_mel``-style
    ASR consumers directly, matching this repo's TGA interchange.
    ``"log10"`` quantizes the UNNORMALIZED log10 column exactly like the
    reference wasm binding (``src/wasm.rs:110-114`` — its ``norm_mel``
    call is commented out); rdft/bf3 only. The VAD protocol consumes the
    normalized frames in both modes, as the reference's detector does.
    """

    def __init__(self, config: MelConfig = MelConfig(),
                 n_streams: int = 16,
                 settings: DetectionSettings = DetectionSettings(),
                 dtype=jnp.float32, fft_impl: str = "rdft",
                 record_norm: str = "whisper"):
        if record_norm not in ("whisper", "log10"):
            raise ValueError("record_norm must be 'whisper' or 'log10'")
        if record_norm == "log10" and fft_impl == "sig":
            raise ValueError(
                "record_norm='log10' needs fft_impl 'rdft' or 'bf3' "
                "(the sig kernel applies the whisper norm in-kernel)"
            )
        self.mel = MultiStreamMel(config, n_streams, dtype=dtype,
                                  fft_impl=fft_impl)
        self.vad = MultiStreamVad(settings, n_streams, config.n_mels)
        self.config = config
        self.n_streams = n_streams
        self.record_norm = record_norm

    def init(self) -> FrontendState:
        return FrontendState(self.mel.init(), self.vad.init())

    @functools.partial(jax.jit, static_argnums=0)
    def _tick_jit(self, state: FrontendState, chunks: jnp.ndarray,
                  active: jnp.ndarray):
        if self.record_norm == "log10":
            mstate, record, mels, valid = self.mel._push_many_both_jit(
                state.mel, chunks, active
            )
        else:
            mstate, mels, valid = self.mel._push_many_jit(state.mel,
                                                          chunks, active)
            record = mels
        vstate, va = self.vad._push_jit(state.vad, mels, valid)
        q, lo, hi = quantize_frames_jnp(record)
        return FrontendState(mstate, vstate), q, lo, hi, va, valid

    def push_many(self, state: FrontendState, chunks, active=None):
        chunks = jnp.asarray(chunks, self.mel.dtype)
        hop = self.config.hop_size
        ok = (chunks.shape[0] == self.n_streams) and (
            (chunks.ndim == 3 and chunks.shape[2] == hop)
            or (chunks.ndim == 2 and chunks.shape[1] % hop == 0)
        )
        if not ok:
            raise ValueError(
                "chunks must be [n_streams, n_hops, hop_size] or flat "
                "[n_streams, n_hops*hop_size]")
        n_mels = self.config.n_mels
        n_hops = (chunks.shape[1] if chunks.ndim == 3
                  else chunks.shape[1] // hop)
        if n_hops == 0:
            z = np.zeros((self.n_streams, 0), np.float32)
            return (state, np.zeros((self.n_streams, 0, n_mels), np.uint8),
                    z, z, z.astype(bool), z.astype(bool))
        if active is None:
            active = jnp.ones(self.n_streams, dtype=bool)
        state, q, lo, hi, va, valid = self._tick_jit(
            state, chunks, jnp.asarray(active, bool)
        )
        # ONE device_get for all outputs: fetching them one by one costs
        # a round trip each on remote runtimes (measured 165 -> 42 ms
        # p50 per 256-stream tick through the tunnel)
        return (state, *jax.device_get((q, lo, hi, va, valid)))

    def reset(self, state: FrontendState, mask) -> FrontendState:
        mask = jnp.asarray(mask, bool)
        return FrontendState(self.mel.reset(state.mel, mask),
                             self.vad.reset(state.vad, mask))

    # -- checkpoint/resume (streaming/state_io.py): persist every live
    # stream's carried window + VAD history across a process restart
    def state_meta(self) -> dict:
        return _frontend_meta(self)

    def save_state(self, path, state: FrontendState) -> None:
        save_stream_state(path, state, meta=self.state_meta())

    def load_state(self, path) -> FrontendState:
        return load_stream_state(path, like=self.init(),
                                 meta=self.state_meta())


class SourceRateState(NamedTuple):
    rs: MultiResampleState
    fe: FrontendState


class SourceRateFrontend:
    """The complete serving tick for a rate-homogeneous fleet whose
    clients send SOURCE-rate PCM (8 k telephony, 44.1/48 k media): one
    device dispatch runs resample -> mel -> streaming VAD -> u8 quant
    for all ``S`` streams, so ingest rate conversion costs no host FIR
    work at all (``examples/serve_streams.py --input-rate`` does that
    per-stream on the host).

    ``push_many(state, chunks [S, H, hop_src], active)`` takes
    ``hop_src = hop * down / up`` SOURCE samples per hop and returns the
    exact ``MultiStreamFrontend`` output tuple. Frame-grid parity with
    host-side resampling is structural: the resampler's spurious warm-up
    prefix is an exact multiple of the hop (``align=hop``) and the mel
    warm-up counter starts at ``-spurious_out``, so every VALID frame
    equals the host-resampled pipeline's frame at the same index (to f32
    matmul associativity; test-enforced).
    """

    def __init__(self, config: MelConfig = MelConfig(),
                 n_streams: int = 16, input_rate: int = 48000,
                 settings: DetectionSettings = DetectionSettings(),
                 dtype=jnp.float32, fft_impl: str = "rdft",
                 record_norm: str = "whisper", beta: float = 5.0,
                 resample_impl: str = "auto",
                 resample_precision: str = "bf3"):
        # resample_precision defaults to "bf3" HERE (the resampler
        # itself defaults to "highest"): the tick's consumer is the
        # log-mel record, whose error budget is 1e-5-class before the
        # u8 quant step — the 7.1e-6 ingest delta is invisible there,
        # and the 3-pass dot saves 0.43 ms device per 256x500-hop tick
        # (tools/resample_bf3_ab.py). Pass "highest" for bit-parity
        # with host-side resample_poly ingest.
        from melspec_tpu.ops.resample import validate_ratio
        from melspec_tpu.streaming.resample import MultiStreamResampler

        up, down = validate_ratio(int(config.sampling_rate),
                                  int(input_rate))
        if up == down:
            raise ValueError(
                "input_rate equals the config rate; use MultiStreamFrontend"
            )
        hop = config.hop_size
        if (hop * down) % up:
            raise ValueError(
                f"one {hop}-sample hop at {config.sampling_rate:.0f} Hz is "
                f"not a whole number of samples at {input_rate} Hz"
            )
        self.hop_src = hop * down // up
        self.front = MultiStreamFrontend(config, n_streams, settings,
                                         dtype, fft_impl, record_norm)
        self.rs = MultiStreamResampler(up, down, n_streams, align=hop,
                                       beta=beta, impl=resample_impl,
                                       precision=resample_precision)
        assert self.rs.spurious_out % hop == 0
        self.config = config
        self.n_streams = n_streams
        self.beta = float(beta)

    def _delay_idx(self, mel_state, mask=None):
        """Start (or restart) the mel warm-up counter at
        ``-spurious_out`` so frames touching the resampler's garbage
        prefix are never marked valid."""
        d = jnp.int32(self.rs.spurious_out)
        idx = mel_state.idx - d if mask is None else jnp.where(
            mask, mel_state.idx - d, mel_state.idx)
        return mel_state._replace(idx=idx)

    def init(self) -> SourceRateState:
        fe = self.front.init()
        return SourceRateState(
            self.rs.init(), FrontendState(self._delay_idx(fe.mel), fe.vad)
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _tick_jit(self, state: SourceRateState, chunks: jnp.ndarray,
                  active: jnp.ndarray):
        # flat end-to-end: the resampler consumes the flat source signal
        # and its flat output feeds the mel stage's signal concat
        # directly — no [S, H, hop] layout ever exists on device (each
        # 3D<->flat retiling measured ~0.7 ms of the 256x500-hop tick,
        # tools/resample_probe4.py)
        if chunks.ndim == 3:
            chunks = chunks.reshape(chunks.shape[0], -1)
        rstate, y = self.rs.step(state.rs, chunks, active)
        fstate, q, lo, hi, va, valid = self.front._tick_jit(
            state.fe, y, active
        )
        return SourceRateState(rstate, fstate), q, lo, hi, va, valid

    def push_many(self, state: SourceRateState, chunks, active=None):
        chunks = jnp.asarray(chunks, jnp.float32)
        ok = (chunks.shape[0] == self.n_streams) and (
            (chunks.ndim == 3 and chunks.shape[2] == self.hop_src)
            or (chunks.ndim == 2 and chunks.shape[1] % self.hop_src == 0)
        )
        if not ok:
            raise ValueError(
                f"chunks must be [n_streams, n_hops, {self.hop_src}] or "
                f"flat [n_streams, n_hops*{self.hop_src}]")
        h = (chunks.shape[1] if chunks.ndim == 3
             else chunks.shape[1] // self.hop_src)
        n_mels = self.config.n_mels
        if h == 0:
            z = np.zeros((self.n_streams, 0), np.float32)
            return (state, np.zeros((self.n_streams, 0, n_mels), np.uint8),
                    z, z, z.astype(bool), z.astype(bool))
        # any whole number of hops consumes whole resampler windows:
        # hop_src integral means up | hop (gcd(up, down) = 1), so
        # h*hop_src = h*hop*down/up is always a multiple of down
        if active is None:
            active = jnp.ones(self.n_streams, dtype=bool)
        state, q, lo, hi, va, valid = self._tick_jit(
            state, chunks, jnp.asarray(active, bool)
        )
        return (state, *jax.device_get((q, lo, hi, va, valid)))

    def reset(self, state: SourceRateState, mask) -> SourceRateState:
        mask = jnp.asarray(mask, bool)
        fe = self.front.reset(state.fe, mask)
        return SourceRateState(
            self.rs.reset(state.rs, mask),
            FrontendState(self._delay_idx(fe.mel, mask), fe.vad),
        )

    def state_meta(self) -> dict:
        meta = _frontend_meta(self.front)
        meta.update(kind="SourceRateFrontend",
                    up=self.rs.up, down=self.rs.down, beta=self.beta,
                    spurious_out=self.rs.spurious_out)
        return meta

    def save_state(self, path, state: SourceRateState) -> None:
        save_stream_state(path, state, meta=self.state_meta())

    def load_state(self, path) -> SourceRateState:
        return load_stream_state(path, like=self.init(),
                                 meta=self.state_meta())


def shared_frontend(config: MelConfig = MelConfig(), n_streams: int = 16,
                    settings: DetectionSettings = DetectionSettings(),
                    fft_impl: str = "rdft", record_norm: str = "whisper",
                    input_rate: int | None = None, beta: float = 5.0):
    """The canonical (process-shared) serving frontend for this config —
    ``SourceRateFrontend`` when ``input_rate`` differs from the config
    rate, else ``MultiStreamFrontend``. Always constructing through ONE
    argument spelling keeps ``shared_instance``'s key stable, so e.g.
    :func:`calibrate_fft_impl`'s probe instances are the very instances
    a server then serves with (no recompile)."""
    from melspec_tpu.utils.instances import shared_instance

    if input_rate is not None and input_rate != int(config.sampling_rate):
        return shared_instance(
            SourceRateFrontend, config, n_streams, input_rate=input_rate,
            settings=settings, fft_impl=fft_impl, record_norm=record_norm,
            beta=beta)
    return shared_instance(
        MultiStreamFrontend, config, n_streams, settings=settings,
        fft_impl=fft_impl, record_norm=record_norm)


def calibrate_fft_impl(config: MelConfig = MelConfig(), n_streams: int = 16,
                       hops: int = 4,
                       settings: DetectionSettings = DetectionSettings(),
                       record_norm: str = "whisper",
                       input_rate: int | None = None, beta: float = 5.0,
                       reps: int = 3, verbose: bool = True) -> str:
    """One-shot per-process A/B between the serving tick's two bulk
    routes — the XLA framed-matmul pipeline (``"rdft"``) and the fused
    signal-input Pallas kernel (``"sig"``) — at THIS deployment's tick
    shape. Returns the faster route's name.

    Why measure instead of defaulting: the two routes' relative speed
    flip-flopped across three benching sessions on the same chip model
    (355k/264k -> 392k/424k -> 351k/647k x RT; ``docs/ROADMAP.md`` item
    1), a ~1.8x swing no static default captures. A serving process pays
    two tick compiles once at startup and serves the measured winner
    (``examples/serve_streams.py --fft-impl auto``).

    Falls back to ``"rdft"`` without timing when the sig route cannot
    serve this config (``record_norm="log10"`` — the sig kernel
    normalizes in-kernel; no macro-row geometry for the (fft, hop)
    pair) or when no accelerator backend is present (the sig kernel
    would run interpret-mode — meaninglessly slow, and CPU serving is a
    test rig).
    """
    import jax as _jax

    from melspec_tpu.ops.mel_kernel import sig_geometry

    if record_norm == "log10":
        return "rdft"
    if _jax.default_backend() not in ("tpu", "gpu"):
        return "rdft"
    if sig_geometry(config.fft_size, config.hop_size,
                    offset=config.hop_size) is None:
        return "rdft"

    rng = np.random.default_rng(7)
    times = {}
    for impl in ("rdft", "sig"):
        front = shared_frontend(config, n_streams, settings, impl,
                                record_norm, input_rate, beta)
        hop_in = getattr(front, "hop_src", config.hop_size)
        base = (rng.standard_normal((n_streams, hops, hop_in)) * 0.1
                ).astype(np.float32)
        state = front.init()
        state = front.push_many(state, base)[0]  # compile + warm
        best = float("inf")
        for r in range(reps):
            # bit-distinct input per rep: identical execute requests can
            # be memoized by remote runtimes (bench.py's _bench notes);
            # the carried state chains rep r into rep r+1, and push_many
            # ends with a real host fetch, so the wall time is honest
            x = base + np.float32((r + 1) * 1e-6)
            t0 = time.perf_counter()
            state = front.push_many(state, x)[0]
            best = min(best, time.perf_counter() - t0)
        times[impl] = best
    pick = min(times, key=times.get)  # type: ignore[arg-type]
    if verbose:
        print("calibrate_fft_impl["
              f"{n_streams}sx{hops}h]: "
              + ", ".join(f"{k} {v * 1e3:.2f} ms" for k, v in times.items())
              + f" -> {pick}", file=sys.stderr)
    return pick
