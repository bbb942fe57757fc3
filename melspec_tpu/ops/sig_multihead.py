"""Multi-head signal-input kernel: one spectral pass, several frontends.

The reference computes each frontend independently — whisper mel
(``src/mel.rs``), Kaldi fbank (``src/fbank.rs``) — re-reading the signal
and re-framing per frontend. On TPU the expensive shared work for
frontends on the SAME frame grid (frame k at ``k*hop``, same frame
length) is identical: the HBM signal read, the macro-row window DMA, the
lane-roll frame assembly, and the bf16 slice cascade. This kernel does
that work ONCE and N-concatenates the per-frontend window-folded spectral
matrices into one wide MXU matmul::

    xcat [frames, n_pairs*k_pad] @ [m_head0 | m_head1 | ...]

then splits the result into per-head power -> projection -> output stages
(whisper norm / ln_guard / ln_floor), everything tile-resident in VMEM.
Each head may carry a different FFT size (bin count) — only the frame
GRID must match; e.g. Kaldi's 512-point FFT over 400-sample frames rides
alongside whisper's 400-point FFT because both matrices have 400 real
contraction rows. Head 0 can additionally run the fused Sobel VAD
epilogue.

This is the engine behind the configurable composite frontend step
(``parallel/sharding.sharded_frontend_step``).
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from melspec_tpu.ops.mel_kernel import (
    LANES,
    _sig_flat_geometry,
    _sig_host_prep,
    _sig_natural_order,
    _sig_natural_order_flat,
    _sig_out_vals,
    _sig_project,
    _sig_slices,
    _sig_vad_counts,
    _sig_vad_counts_flat,
    _sig_window_frames,
    _sig_window_frames_flat,
    _sig_xcat_from,
    sig_geometry,
)

# head spec: (n_cols, n_bins_pad, n_mels_out, out_mode, guard,
# mel_precision) — n_cols is the head's width in the concatenated y;
# n_bins_pad is the re|im split point, 0 for the N-packed layout (each
# column a single squared component, the re/im add riding the projection
# — see mel_kernel._sig_frontend_matrices)
HeadSpec = Tuple[int, int, int, str, float, str]


def _sig_multi_tile_kernel(sig_ref, tailpad_ref, *refs,
                           ks: int, pair_i, k_pad: int,
                           packs: Tuple[Tuple[int, int], ...],
                           offset: int,
                           tail_rows: int, row_w: int, phases: int,
                           rows_tile: int, heads: Tuple[HeadSpec, ...],
                           head_blocks: Tuple[tuple | None, ...],
                           vad: tuple | None,
                           flat: tuple | None = None):
    n_heads = len(heads)
    mb_refs = refs[:n_heads]
    mt_refs = refs[n_heads : 2 * n_heads]
    out_refs = refs[2 * n_heads : 3 * n_heads]
    rest = refs[3 * n_heads :]
    if vad is not None:
        vad_ref, rest = rest[0], rest[1:]

    if flat is not None:
        # FLAT input: frames straight from [B, T], position-major rows
        # (see mel_kernel._sig_flat_geometry)
        pos_tile, n_classes, stride, fetch_w = flat
        s_scratch, dma_sems = rest
        frames = _sig_window_frames_flat(
            sig_ref, s_scratch, dma_sems,
            pos_tile=pos_tile, hop=row_w // phases, k_pad=k_pad,
            offset=offset, stride=stride, n_classes=n_classes,
            fetch_w=fetch_w,
        )
    else:
        s_scratch, dma_sems, tail_sems = rest
        frames = _sig_window_frames(
            sig_ref, tailpad_ref, s_scratch, dma_sems, tail_sems,
            rows=rows_tile, tail_rows=tail_rows, row_w=row_w,
            phases=phases, k_pad=k_pad, offset=offset,
        )
    # shared bf16 residual cascade; per-head dot, with the K-concat
    # CACHED per block signature (all-None head_blocks => exactly one
    # xcat, as round 3's wide m_cat matmul — same products, same MXU
    # accumulation, verified bit-exact on chip). head_blocks lets a
    # coarse-gate head contract over a SUBSET of the slice-pair blocks;
    # measured on the kaldi head (blocks (0,0),(0,1),(1,0), JFK): 0.304
    # max ln-output error — ln amplifies the dropped 2^-16 DFT terms on
    # near-null bins — vs its 0.0152 golden gate, so the default keeps
    # every block (docs/ROADMAP.md round-4 ablation table).
    x_slices = _sig_slices(frames, ks)
    xcats: dict = {}

    for h, (n_cols, nbp, n_mels_out, out_mode, guard,
            mel_prec) in enumerate(heads):
        # heads may frame DIFFERENT tap windows of the shared k_pad-wide
        # frame tile: (pack, pack_off) picks head h's raw-sample span —
        # e.g. the NeMo head's 513-tap preemphasis-folded window at
        # offset 0 alongside whisper/kaldi's 400-tap windows at 257
        pack_h, off_h = packs[h]
        key = (head_blocks[h], mb_refs[h].shape[0], pack_h, off_h)
        if key not in xcats:
            xcats[key] = _sig_xcat_from(x_slices, pair_i, pack_h,
                                        mb_refs[h].shape[0],
                                        pack_off=off_h,
                                        blocks=head_blocks[h])
        blk = jnp.dot(xcats[key], mb_refs[h][:],
                      preferred_element_type=jnp.float32)[:, :n_cols]
        if nbp:
            power = (blk[:, :nbp] * blk[:, :nbp]
                     + blk[:, nbp : 2 * nbp] * blk[:, nbp : 2 * nbp])
        else:
            power = blk * blk
        prec = "bf2" if mel_prec == "bf2" else jax.lax.Precision.HIGHEST
        energy = _sig_project(power, mt_refs[h], prec)
        if flat is not None:
            vals3 = _sig_natural_order_flat(
                _sig_out_vals(energy, out_mode, guard), flat[0])
            out_refs[h][...] = vals3[:, :, : out_refs[h].shape[-1]]
            if vad is not None and h == 0:
                vad_ref[...] = _sig_vad_counts_flat(vals3, vad, n_mels_out)
        else:
            vals = _sig_natural_order(
                _sig_out_vals(energy, out_mode, guard), phases, rows_tile)
            out_refs[h][0] = vals[:, : out_refs[h].shape[-1]]
            if vad is not None and h == 0:
                vad_ref[0] = _sig_vad_counts(vals, vad, n_mels_out)


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "ks", "pair_i", "n_frames", "offset",
                     "row_w", "phases", "rows_tile", "heads",
                     "head_blocks", "vad", "pack", "flat_rows"),
)
def _pallas_sig_multi(
    samples: jnp.ndarray,  # [B, T] float32 raw signal
    *mbs_and_mts,          # n_heads spectral matrices, n_heads projections
    interpret: bool,
    ks: int,
    pair_i: tuple,
    n_frames: int,
    offset: int = 0,
    row_w: int,
    phases: int,
    rows_tile: int,
    heads: Tuple[HeadSpec, ...],
    head_blocks: Tuple[tuple | None, ...] | None = None,
    vad: tuple | None = None,
    pack: int,
    flat_rows: int = 512,
):
    """Run the multi-head kernel. Returns one ``[B, n_frames, n_mels]``
    array per head (plus the ``[B, n_frames]`` int32 VAD counts when
    ``vad`` is set), each written directly in its final layout.

    ``head_blocks[h]`` optionally restricts head ``h``'s K contraction to
    a subset of the slice-pair blocks (its spectral matrix must carry
    exactly those blocks' rows) — see ``_sig_xcat_from``.

    ``pack`` is either one tap count shared by every head (the
    two-head pair kernel: all heads frame the same [0, pack) window) or
    a per-head ``((pack, pack_off), ...)`` tuple — each head contracts
    raw window positions ``[pack_off, pack_off + pack)`` of the shared
    frame tile, which is how a centered/preemphasis-folded head (NeMo's
    513-tap window at offset 0) rides the same DMA + slice cascade as
    batch-framed heads (whisper/kaldi's 400 taps at offset 257)."""
    b, t = samples.shape
    n_heads = len(heads)
    mbs, mts = mbs_and_mts[:n_heads], mbs_and_mts[n_heads:]
    if head_blocks is None:
        head_blocks = (None,) * n_heads
    for h, spec in enumerate(heads):
        if spec[0] != mbs[h].shape[1]:
            raise ValueError("head column width must match its matrix")
    packs = (((pack, 0),) * n_heads if isinstance(pack, int)
             else tuple(pack))
    k_span = max(p + o for p, o in packs)
    k_pad = -(-k_span // LANES) * LANES
    # flat_rows=0: force rows mode. The fused-VAD epilogue pins the flat
    # tile to 128 frames/clip (1024 MXU rows); three wide heads' xcats
    # at that tile overflow scoped VMEM (measured 17.15M vs the 16M
    # limit), while rows mode tiles at phases*rows_tile.
    flat = None if flat_rows == 0 else _sig_flat_geometry(
        row_w // phases, k_pad, offset, b, t,
        target_rows=flat_rows, epilogue=(vad is not None))
    if flat is not None:
        frames_tile = flat[0]
        tiles = -(-n_frames // frames_tile)
        tail_rows = 0
    else:
        frames_tile = phases * rows_tile
        tiles = -(-n_frames // frames_tile)
        sig, tailpad, tail_rows = _sig_host_prep(samples, tiles, row_w,
                                                 rows_tile)

    kernel = functools.partial(
        _sig_multi_tile_kernel, ks=ks, pair_i=pair_i, k_pad=k_pad,
        packs=packs,
        offset=offset, tail_rows=tail_rows, row_w=row_w, phases=phases,
        rows_tile=rows_tile, heads=heads, head_blocks=head_blocks,
        vad=vad, flat=flat,
    )
    cb = 8 if flat is not None else 1
    out_specs = [
        pl.BlockSpec((cb, frames_tile, h[2]), lambda bb, tt: (bb, tt, 0),
                     memory_space=pltpu.VMEM)
        for h in heads
    ]
    out_shape = [jax.ShapeDtypeStruct((b, n_frames, h[2]), jnp.float32)
                 for h in heads]
    if vad is not None:
        out_specs.append(pl.BlockSpec((cb, 8, frames_tile),
                                      lambda bb, tt: (bb, 0, tt),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 8, n_frames),
                                              jnp.int32))

    dot_flops = 2 * b * tiles * frames_tile * sum(
        mb.shape[0] * mb.shape[1] for mb in mbs)
    if flat is not None:
        base = kernel
        kernel = lambda s, *r: base(s, None, *r)  # noqa: E731
        return pl.pallas_call(
            kernel,
            grid=(b // 8, tiles),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),  # FLAT [B, T] signal
            ] + [pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (len(mbs) + len(mts)),
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[
                pltpu.VMEM((2, 8, flat[3]), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=dot_flops,
                bytes_accessed=((b // 8) * tiles * 8 * flat[3]
                                + sum(b * n_frames * h[2]
                                      for h in heads)) * 4,
                transcendentals=sum(b * n_frames * h[2] for h in heads),
            ),
            interpret=interpret,
        )(samples, *mbs, *mts)
    return pl.pallas_call(
        kernel,
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),    # macro-row signal
            pl.BlockSpec(memory_space=pltpu.HBM),    # ragged tail rows
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        * (len(mbs) + len(mts)),
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, rows_tile + 8, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=dot_flops,
            bytes_accessed=(b * (rows_tile * tiles + 8) * row_w
                            + sum(b * n_frames * h[2] for h in heads)) * 4,
            transcendentals=sum(b * n_frames * h[2] for h in heads),
        ),
        interpret=interpret,
    )(sig, tailpad, *mbs, *mts)


class WhisperKaldiFused:
    """Whisper log-mel + Kaldi log-fbank (+ fused Sobel VAD) over one
    shared spectral pass.

    Requires the two frontends to share a frame grid: whisper's
    ``(fft_size, hop_size)`` must equal Kaldi's
    ``(frame_length_samples, frame_shift_samples)`` — true for both
    defaults (400/160 at 16 kHz). Kaldi's padded 512-point FFT is fine:
    its head simply carries more bins.

    ``compute(samples)`` -> ``(mel [B, F, n_mels], fbank [B, F, bins])``;
    ``compute_with_vad(samples, settings)`` additionally returns the raw
    Sobel column-activity ``[B, F-2]`` bool (reference
    ``src/vad.rs:373-415`` classification of the whisper image).
    """

    def __init__(self, mel_config=None, fbank_config=None,
                 interpret: bool | None = None,
                 fbank_blocks: tuple | None = None):
        from melspec_tpu.config import FbankConfig, MelConfig
        from melspec_tpu.ops.fbank import F32_EPSILON, Fbank
        from melspec_tpu.ops.mel_kernel import _sig_device_matrices

        self.mel_config = mel_config or MelConfig()
        self.fbank_config = fbank_config or FbankConfig(apply_cmn=True)
        mc, kc = self.mel_config, self.fbank_config
        if (mc.fft_size != kc.frame_length_samples
                or mc.hop_size != kc.frame_shift_samples):
            raise ValueError(
                "fused whisper+kaldi needs one frame grid: whisper "
                f"({mc.fft_size}, {mc.hop_size}) vs kaldi "
                f"({kc.frame_length_samples}, {kc.frame_shift_samples})"
            )
        geom = sig_geometry(mc.fft_size, mc.hop_size)
        if geom is None:
            raise ValueError("no macro-row geometry for this frame grid")
        self._geom = geom
        self._interpret = interpret

        m_w, pair_i, _mt_hi, mt_w, nbp_w, _, _k_pad_w, _npack_w = \
            _sig_device_matrices(mc.fft_size, mc.n_mels,
                                 float(mc.sampling_rate), 3, 3, 2)
        kaldi = Fbank(kc, fft_impl="sig")
        self._kaldi = kaldi
        m_k, pair_k = kaldi._sig_m_big, kaldi._sig_pair_i
        assert pair_k == pair_i, "pair schedules must match to share xcat"
        # both stacks are K-packed at the shared frame length, so the row
        # layouts coincide block-for-block
        assert m_k.shape[0] == m_w.shape[0], \
            "shared frame grid implies identical packed K"
        # kaldi head K-block subset (fbank_blocks): contracts the fbank
        # head over a subset of the slice-pair blocks for
        # proportionally less MXU work. Default None (all blocks):
        # measured on JFK, the low-order subset (0, 1, 3) costs 0.304
        # max ln-output error — ln amplifies the dropped O(2^-16) DFT
        # terms on near-null bins — which would blow the 0.0152 kaldi
        # golden gate, so reduced K is opt-in for consumers with
        # coarser bars (docs/ROADMAP.md round-4 ablation table).
        pack = mc.fft_size
        if fbank_blocks is not None:
            rows = np.concatenate([np.arange(b * pack, (b + 1) * pack)
                                   for b in fbank_blocks])
            sub = np.asarray(m_k, np.float32)[rows]
            k_sub = -(-sub.shape[0] // 128) * 128
            sub = np.pad(sub, ((0, k_sub - sub.shape[0]), (0, 0)))
            m_k = jnp.asarray(sub, jnp.bfloat16)  # values already bf16
        self._mbs = (m_w, m_k)
        self._head_blocks = (None, tuple(fbank_blocks)
                             if fbank_blocks is not None else None)
        self._mts = (mt_w, kaldi._sig_mt)
        floor = (kc.energy_floor if kc.energy_floor > 0.0 else F32_EPSILON)
        self._heads = (
            # whisper: at the 400-point default the auto layout is split
            # re|im (packing would not narrow that head but would double
            # its projection K); other fft sizes may auto-pack, in which
            # case nbp_w arrives as 0 (the packed sentinel) already
            (m_w.shape[1], nbp_w, mc.n_mels, "whisper", 0.0, "bf2"),
            # kaldi: N-packed 512-lane head (Fbank builds it packed —
            # 33% narrower than split re|im); its fbank gate is coarse
            # (max < 0.0152 vs the kaldi golden) and the ~1e-6 bf2
            # projection perturbation is free speed
            (self._mbs[1].shape[1], 0, kc.num_mel_bins, "ln_floor",
             float(floor), "bf2"),
        )
        self._pair_i = pair_i
        # measured-best tile for the wide two-head y (VMEM pressure):
        # 64 rows x 4 phases
        row_w, phases, rows_tile = self._geom
        self._geom = (row_w, phases, min(rows_tile, 64))

    def _interp(self) -> bool:
        if self._interpret is not None:
            return self._interpret
        return jax.default_backend() not in ("tpu", "gpu")

    def _run(self, samples, vad):
        from melspec_tpu.ops import framing

        from melspec_tpu.ops.mel_kernel import (LANES, _pad_for_flat,
                                                sig_effective_frames_tile)

        x = jnp.asarray(samples, jnp.float32)
        if x.ndim == 1:
            x = x[None]
        mc = self.mel_config
        n_frames = framing.num_frames_batch(x.shape[-1], mc.fft_size,
                                            mc.hop_size)
        row_w, phases, rows_tile = self._geom
        b_real = x.shape[0]
        x = _pad_for_flat(x, mc.hop_size,
                          -(-mc.fft_size // LANES) * LANES, 0,
                          epilogue=(vad is not None))
        outs = _pallas_sig_multi(
            x, *self._mbs, *self._mts, interpret=self._interp(), ks=3,
            pair_i=self._pair_i, n_frames=n_frames, row_w=row_w,
            phases=phases, rows_tile=rows_tile, heads=self._heads,
            head_blocks=self._head_blocks, vad=vad, pack=mc.fft_size,
        )
        outs = tuple(o[:b_real] for o in outs)
        eff_tile = sig_effective_frames_tile(
            mc.fft_size, mc.hop_size, 0, x.shape[0], x.shape[-1],
            phases, rows_tile,
        )
        return outs, n_frames, eff_tile

    @functools.partial(jax.jit, static_argnums=0)
    def compute(self, samples):
        (mel, fbank), _, _ = self._run(samples, None)
        if self.fbank_config.apply_cmn:
            fbank = fbank - jnp.mean(fbank, axis=-2, keepdims=True)
        return mel, fbank

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def compute_with_vad(self, samples, settings):
        from melspec_tpu.ops.vad import classify_columns

        thr = float(settings.min_energy) ** 2
        start_y = min(int(settings.min_mel), self.mel_config.n_mels - 2)
        (mel, fbank, counts), n_frames, frames_tile = self._run(
            samples, (thr, start_y, int(settings.min_y))
        )
        raw = counts[:, 0, : n_frames - 2] >= int(settings.min_y)
        tiles = -(-n_frames // frames_tile)
        bidx = tuple(
            xcol
            for k in range(1, tiles)
            for xcol in (k * frames_tile - 2, k * frames_tile - 1)
            if xcol < n_frames - 2
        )
        if bidx:
            tri = jnp.stack([mel[:, x : x + 3, :] for x in bidx], axis=1)
            fix = classify_columns(jnp.swapaxes(tri, -1, -2),
                                   settings)[..., 0]
            raw = raw.at[:, jnp.asarray(bidx)].set(fix)
        if self.fbank_config.apply_cmn:
            fbank = fbank - jnp.mean(fbank, axis=-2, keepdims=True)
        return mel, fbank, raw


class WhisperKaldiNemoFused(WhisperKaldiFused):
    """Three frontends — whisper mel, Kaldi fbank, NeMo log-mel — over
    ONE shared spectral pass (VERDICT r4 item 5's experiment: the NeMo
    head rides the pair kernel's signal DMA + bf16 slice cascade while
    keeping its own wider matrices).

    The NeMo head's frame differs from the batch grid in two LINEAR
    ways, both folded into its spectral matrices over the RAW window:
    the center pad (its 512-tap frame starts ``n_fft//2`` samples
    earlier) and the cross-frame pre-emphasis
    ``y[t] = x[t] - p*x[t-1]`` (a banded ``[512, 513]`` rectangular
    preproc — one extra raw tap; ``docs/ROADMAP.md`` item 2's "k_pad
    512->640" absorption cost, accepted here because the head SHARES
    the DMA/assembly/cascade instead of paying its own). The shared
    frame tile widens to ``k_span = 657`` raw samples (signal
    left-padded by 257 zeros, which also reproduces NeMo's center/
    pre-emphasis edge semantics exactly); whisper/kaldi contract window
    positions ``[257, 657)``, NeMo ``[56, 457)`` — the per-head
    ``(pack, pack_off)`` plumbing of ``_pallas_sig_multi``.

    Frame counts differ by design: the kernel emits NeMo's centered
    count (``T//hop + 1``) for every head and whisper/kaldi outputs are
    sliced back to the batch count.

    ``compute(samples)`` -> ``(mel, fbank, nemo_feats)`` where
    ``nemo_feats`` is feature-major ``[B, bins, F']`` with the config's
    normalize/pad_to applied — the same contract as
    ``BatchLogMel.compute``. ``compute_with_vad`` additionally returns
    the raw Sobel activity like the parent.
    """

    def __init__(self, mel_config=None, fbank_config=None,
                 nemo_config=None, interpret: bool | None = None):
        from melspec_tpu.config import BatchLogMelConfig
        from melspec_tpu.ops.batch_logmel import BatchLogMel
        from melspec_tpu.ops.mel_kernel import (_sig_frontend_matrices,
                                                bf2_stack)

        super().__init__(mel_config, fbank_config, interpret=interpret)
        nc = nemo_config or BatchLogMelConfig()
        mc = self.mel_config
        if (int(nc.sample_rate) != int(mc.sampling_rate)
                or nc.hop_length != mc.hop_size or not nc.center):
            raise ValueError(
                "NeMo head needs the shared hop grid and center=True")
        self.nemo_config = nc
        self.nemo = BatchLogMel(nc)  # epilogue (norm/pad_to) + filters
        n_fft, win, p = nc.n_fft, nc.win_length, float(nc.preemphasis)
        # banded rectangular pre-emphasis fold over the raw window:
        # frame tap t = x_raw[pos t+1] - p * x_raw[pos t]
        pre_t = np.zeros((n_fft + 1, n_fft))
        pre_t[np.arange(1, n_fft + 1), np.arange(n_fft)] = 1.0
        pre_t[np.arange(n_fft), np.arange(n_fft)] += -p
        flank = (n_fft - win) // 2
        m_n, pair_n, mt_n, nbp_n, _, _, npack_n = _sig_frontend_matrices(
            n_fft, self.nemo.fft_bins, self.nemo._window_np,
            self.nemo.filters, ks=3, km=3, cutoff=2,
            pack=win + 1, pack_off=flank, preproc=pre_t.T,
        )
        assert pair_n == self._pair_i
        self._mbs = self._mbs + (m_n,)
        self._mts = self._mts + (bf2_stack(mt_n),)
        self._head_blocks = self._head_blocks + (None,)
        self._heads = self._heads + (
            (m_n.shape[1], nbp_n, nc.n_mels, "ln_guard",
             float(nc.log_zero_guard), "bf2"),
        )
        self._nemo_pad = n_fft // 2 + 1  # 257 at the defaults
        # per-head raw-window spans: whisper/kaldi frame at +pad,
        # NeMo's folded rows at the window flank
        self._packs = ((mc.fft_size, self._nemo_pad),
                       (mc.fft_size, self._nemo_pad),
                       (win + 1, flank))

    def _run(self, samples, vad):
        from melspec_tpu.ops import framing
        from melspec_tpu.ops.mel_kernel import (LANES, _pad_for_flat,
                                                sig_effective_frames_tile)

        x = jnp.asarray(samples, jnp.float32)
        if x.ndim == 1:
            x = x[None]
        mc = self.mel_config
        t_real = x.shape[-1]
        n_frames = framing.num_frames_centered(t_real, mc.hop_size)
        self._n_frames_batch = framing.num_frames_batch(
            t_real, mc.fft_size, mc.hop_size)
        k_span = max(p + o for p, o in self._packs)
        k_pad = -(-k_span // LANES) * LANES
        x = jnp.pad(x, ((0, 0), (self._nemo_pad, 0)))
        row_w, phases, rows_tile = self._geom
        b_real = x.shape[0]
        if vad is None:
            x = _pad_for_flat(x, mc.hop_size, k_pad, 0, epilogue=False,
                              flat_rows=256)
        outs = _pallas_sig_multi(
            x, *self._mbs, *self._mts, interpret=self._interp(), ks=3,
            pair_i=self._pair_i, n_frames=n_frames, row_w=row_w,
            phases=phases, rows_tile=rows_tile, heads=self._heads,
            head_blocks=self._head_blocks, vad=vad, pack=self._packs,
            flat_rows=256 if vad is None else 0,
        )
        outs = tuple(o[:b_real] for o in outs)
        # VAD path runs rows mode (see flat_rows=0 above)
        eff_tile = phases * rows_tile
        return outs, n_frames, eff_tile

    def _finish(self, mel, fbank, nemo_raw):
        f_w = self._n_frames_batch
        mel, fbank = mel[:, :f_w], fbank[:, :f_w]
        if self.fbank_config.apply_cmn:
            fbank = fbank - jnp.mean(fbank, axis=-2, keepdims=True)
        feats = jnp.swapaxes(nemo_raw, -1, -2)  # [B, bins, F']
        feats = self.nemo._norm_and_pad(feats, nemo_raw.shape[-2])
        return mel, fbank, feats

    @functools.partial(jax.jit, static_argnums=0)
    def compute(self, samples):
        (mel, fbank, nemo_raw), _, _ = self._run(samples, None)
        return self._finish(mel, fbank, nemo_raw)

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def compute_with_vad(self, samples, settings):
        from melspec_tpu.ops.vad import classify_columns

        thr = float(settings.min_energy) ** 2
        start_y = min(int(settings.min_mel), self.mel_config.n_mels - 2)
        (mel, fbank, nemo_raw, counts), n_frames, frames_tile = self._run(
            samples, (thr, start_y, int(settings.min_y))
        )
        f_w = self._n_frames_batch
        raw = counts[:, 0, : f_w - 2] >= int(settings.min_y)
        tiles = -(-n_frames // frames_tile)
        bidx = tuple(
            xcol
            for k in range(1, tiles)
            for xcol in (k * frames_tile - 2, k * frames_tile - 1)
            if xcol < f_w - 2
        )
        if bidx:
            tri = jnp.stack([mel[:, x : x + 3, :] for x in bidx], axis=1)
            fix = classify_columns(jnp.swapaxes(tri, -1, -2),
                                   settings)[..., 0]
            raw = raw.at[:, jnp.asarray(bidx)].set(fix)
        mel, fbank, feats = self._finish(mel, fbank, nemo_raw)
        return mel, fbank, feats, raw
