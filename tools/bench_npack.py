"""In-session A/B: N-packed vs split re|im column layout for the 512-FFT
sig-kernel heads (NeMo log-mel, Kaldi fbank) plus the multihead kernel.

Run on the real chip. Prints slope-calibrated RTFx per variant (reusing
bench.py's ``_bench`` harness so the methodology is the single shared
one); every comparison is within this one session (tunnel sessions vary
+-30%). Round-3 result: NeMo 290k -> 421k, Kaldi 329k -> 361k x RT.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _bench

SR = 16000


def main() -> None:
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    from melspec_tpu.ops.batch_logmel import BatchLogMel, BatchLogMelConfig
    from melspec_tpu.ops.fbank import F32_EPSILON, Fbank, FbankConfig
    from melspec_tpu.ops.mel_kernel import (_pallas_sig_mel,
                                            _sig_frontend_matrices,
                                            bf2_stack)
    from melspec_tpu.ops.sig_multihead import WhisperKaldiFused

    key = jax.random.PRNGKey(0)
    batch, t = 64, 10 * SR
    xs = [jax.random.normal(k, (batch, t), jnp.float32) * 0.1
          for k in jax.random.split(key, 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    # --- NeMo: packed (the default) vs split (forced) ---
    nemo_cfg = BatchLogMelConfig()
    nemo_packed = BatchLogMel(nemo_cfg, fft_impl="sig")
    nemo_split = BatchLogMel(nemo_cfg, fft_impl="sig")
    m_big, pair_i, mt, _, _, _, got = _sig_frontend_matrices(
        nemo_cfg.n_fft, nemo_cfg.fft_bins, nemo_split._window_np,
        nemo_split._filters_np, ks=3, km=3, cutoff=2,
        pack=nemo_split._sig_pack, pack_off=nemo_split._sig_pack_off,
        npack=False)
    assert got is False
    nemo_split._sig_m_big = m_big
    nemo_split._sig_pair_i = pair_i
    nemo_split._sig_npack = False
    nemo_split._sig_mt = bf2_stack(mt)

    # --- Kaldi: packed (the default) vs split, via the same generic
    # builder the class itself uses (preproc = DC-removal + preemphasis)
    kc = FbankConfig(apply_cmn=True)
    kaldi_packed = Fbank(kc, fft_impl="sig")
    kaldi_split = Fbank(kc, fft_impl="sig")
    L = kaldi_split.frame_len
    from melspec_tpu.ops.fbank import kaldi_preproc_matrix

    B = kaldi_preproc_matrix(L, float(kc.preemphasis))
    m_ks, pair_ks, mt_ks, _, _, _, got = _sig_frontend_matrices(
        kaldi_split.fft_size, kaldi_split.fft_bins,
        kaldi_split._window_np, kaldi_split._filters_np,
        ks=3, km=3, cutoff=2, pack=L, preproc=B, npack=False)
    assert got is False
    mt_ks_bf2 = bf2_stack(mt_ks)

    # jitted like Fbank._compute_jit so the CMN epilogue fuses — an
    # eager mean+subtract would bias the A/B against the split arm
    @jax.jit
    def kaldi_split_fn(x):
        floor = kc.energy_floor if kc.energy_floor > 0.0 else F32_EPSILON
        row_w, phases, rows_tile = kaldi_split._sig_geom
        nf = kaldi_split.num_frames(x.shape[-1])
        feats = _pallas_sig_mel(
            x, m_ks, mt_ks_bf2,
            interpret=False, ks=3, pair_i=pair_ks,
            n_frames=nf, pack=L, npack=False, mel_precision="bf2",
            out_mode="ln_floor", guard=float(floor),
            n_mels_out=kc.num_mel_bins, row_w=row_w, phases=phases,
            rows_tile=rows_tile)
        return feats - jnp.mean(feats, axis=-2, keepdims=True)

    fused = WhisperKaldiFused()

    runs = [
        ("nemo_sig_packed", nemo_packed.compute),
        ("nemo_sig_split", nemo_split.compute),
        ("kaldi_sig_packed", kaldi_packed.compute),
        ("kaldi_sig_split", kaldi_split_fn),
        ("multihead_wk_packed", lambda x: fused.compute(x)[1]),
    ]
    for name, fn in runs:
        try:
            wall = _bench(fn, xs, iters=8)
            print(f"{name}: {wall*1e3:.2f} ms -> {audio_s/wall:,.0f}x RT")
        except Exception as e:  # noqa: BLE001
            print(f"{name} failed: {e!r}"[:300])

    # parity spot checks (device numerics, packed vs split)
    x0 = xs[0][:2]
    a = np.asarray(nemo_packed.compute(x0))
    b = np.asarray(nemo_split.compute(x0))
    print(f"nemo packed-vs-split max diff: {np.abs(a - b).max():.3e}")
    a = np.asarray(kaldi_packed.compute(x0))
    b = np.asarray(kaldi_split_fn(x0))
    print(f"kaldi packed-vs-split max diff: {np.abs(a - b).max():.3e}")


if __name__ == "__main__":
    main()
