"""In-session A/B: N-packed vs split re|im column layout for the 512-FFT
sig-kernel heads (NeMo log-mel, Kaldi fbank) plus the multihead kernel.

Run on the real chip. Prints slope-calibrated RTFx per variant; every
comparison is within this one session (tunnel sessions vary +-30%).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

SR = 16000


def bench(fn, xs, iters=8, reps=2):
    def step(i, carry):
        x = xs[i % len(xs)] + carry * 1e-30
        return jnp.sum(fn(x)) * 1e-30

    def timed(n):
        carry = step(0, jnp.zeros((), jnp.float32))
        float(carry)
        t0 = time.perf_counter()
        carry = jnp.zeros((), jnp.float32)
        for i in range(n):
            carry = step(i, carry)
        float(carry)
        return time.perf_counter() - t0

    t_short = min(timed(2) for _ in range(reps))
    t_long = min(timed(2 + iters) for _ in range(reps))
    return max((t_long - t_short) / iters, 1e-9)


def main() -> None:
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    from melspec_tpu.ops.batch_logmel import BatchLogMel, BatchLogMelConfig
    from melspec_tpu.ops.fbank import Fbank, FbankConfig
    from melspec_tpu.ops.mel_kernel import (_sig_frontend_matrices,
                                            bf2_stack)
    from melspec_tpu.ops.sig_multihead import WhisperKaldiFused

    key = jax.random.PRNGKey(0)
    batch, t = 64, 10 * SR
    xs = [jax.random.normal(k, (batch, t), jnp.float32) * 0.1
          for k in jax.random.split(key, 3)]
    jax.block_until_ready(xs)
    audio_s = batch * t / SR

    # --- NeMo: packed (new default) vs split (forced) ---
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

    # --- Kaldi: packed (new default) vs split (manual rebuild) ---
    kc = FbankConfig(apply_cmn=True)
    kaldi_packed = Fbank(kc, fft_impl="sig")
    kaldi_split = Fbank(kc, fft_impl="sig")
    # rebuild split matrices: replicate Fbank.__init__'s fold, split cols
    from melspec_tpu.ops import dft as _dft
    from melspec_tpu.ops.mel_kernel import LANES, _sig_stack_planes

    L = kaldi_split.frame_len
    p = float(kc.preemphasis)
    P = np.eye(L)
    if p > 0.0:
        P[np.arange(1, L), np.arange(L - 1)] = -p
    B = P @ (np.eye(L) - np.full((L, L), 1.0 / L))
    w = kaldi_split._window_np[:, None]
    cos_m, msin_m = _dft.rdft_matrices(kaldi_split.fft_size,
                                       kaldi_split.fft_bins)
    k_pad = -(-L // LANES) * LANES
    n_bins_pad = -(-kaldi_split.fft_bins // LANES) * LANES
    n_mels_pad = -(-kc.num_mel_bins // LANES) * LANES
    cw = np.zeros((k_pad, n_bins_pad))
    sw = np.zeros((k_pad, n_bins_pad))
    cw[:L, : kaldi_split.fft_bins] = B.T @ (w * cos_m[:L])
    sw[:L, : kaldi_split.fft_bins] = B.T @ (w * msin_m[:L])
    kaldi_split._sig_m_big, kaldi_split._sig_pair_i = _sig_stack_planes(
        cw, sw, ks=3, km=3, cutoff=2, pack=L)
    mts = np.zeros((n_bins_pad, n_mels_pad))
    mts[: kaldi_split.fft_bins, : kc.num_mel_bins] = \
        kaldi_split._filters_np.T
    kaldi_split._sig_mt = bf2_stack(mts)

    # Fbank._compute_jit passes npack=True statically; give the split
    # variant a wrapper that calls the kernel with npack=False
    from melspec_tpu.ops.mel_kernel import _pallas_sig_mel
    from melspec_tpu.ops.fbank import F32_EPSILON

    def kaldi_split_fn(x):
        floor = kc.energy_floor if kc.energy_floor > 0.0 else F32_EPSILON
        row_w, phases, rows_tile = kaldi_split._sig_geom
        nf = kaldi_split.num_frames(x.shape[-1])
        feats = _pallas_sig_mel(
            x, kaldi_split._sig_m_big, kaldi_split._sig_mt,
            interpret=False, ks=3, pair_i=kaldi_split._sig_pair_i,
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
            wall = bench(fn, xs)
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
