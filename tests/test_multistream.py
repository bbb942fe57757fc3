"""Multi-stream streaming mel: S concurrent streams must equal S
independent single-stream runs, including masked (inactive) steps and
slot reuse via reset."""

import numpy as np
import jax.numpy as jnp

from melspec_tpu.config import MelConfig
from melspec_tpu.streaming.multistream import MultiStreamMel
from melspec_tpu.streaming.stft import StreamingMel


def test_streams_match_single(jfk_samples):
    config = MelConfig(400, 160, 80, 16000.0)
    n_streams = 4
    multi = MultiStreamMel(config, n_streams, dtype=jnp.float64)
    single = StreamingMel(config, dtype=jnp.float64)

    offsets = [0, 4000, 8000, 12000]
    state = multi.init()
    singles = [single.init() for _ in range(n_streams)]

    for step in range(20):
        chunks = np.stack([
            jfk_samples[off + step * 160 : off + (step + 1) * 160]
            for off in offsets
        ])
        state, mels, valid = multi.push(state, chunks)
        for s in range(n_streams):
            singles[s], out = single.push(singles[s], chunks[s])
            assert bool(valid[s]) == (out is not None)
            if out is not None:
                np.testing.assert_allclose(mels[s], out, atol=1e-12)


def test_inactive_streams_hold_state(jfk_samples):
    config = MelConfig(400, 160, 80, 16000.0)
    multi = MultiStreamMel(config, 2, dtype=jnp.float64)
    state = multi.init()
    chunk = jfk_samples[:160]
    zeros = np.zeros_like(chunk)

    # stream 0 advances; stream 1 stays idle
    for _ in range(5):
        state, _, valid = multi.push(
            state, np.stack([chunk, zeros]), active=[True, False]
        )
    # idx saturates at fft_size once the window has filled (overflow-proof)
    assert int(np.asarray(state.idx)[0]) == min(5 * 160, 400)
    assert int(np.asarray(state.idx)[1]) == 0
    assert not valid[1]


def test_reset_reuses_slot(jfk_samples):
    config = MelConfig(400, 160, 80, 16000.0)
    multi = MultiStreamMel(config, 2, dtype=jnp.float64)
    state = multi.init()
    chunk = jfk_samples[:160]
    for _ in range(4):
        state, _, _ = multi.push(state, np.stack([chunk, chunk]))
    state = multi.reset(state, [False, True])
    assert int(np.asarray(state.idx)[1]) == 0
    assert float(np.abs(np.asarray(state.hop_buf)[1]).sum()) == 0.0
    assert int(np.asarray(state.idx)[0]) == min(4 * 160, 400)


def test_push_many_bulk_matches_scan(jfk_samples):
    """The bulk (batched-framing) multi-hop push must match the per-hop
    scan path decision-for-decision and mel-for-mel."""
    config = MelConfig(400, 160, 80, 16000.0)
    multi = MultiStreamMel(config, 4, dtype=jnp.float64)
    rng = np.random.default_rng(3)
    h = 25
    chunks = np.stack([
        jfk_samples[i * 4000 : i * 4000 + h * 160].reshape(h, 160)
        for i in range(4)
    ])
    active = np.array([True, True, False, True])

    s_bulk = multi.init()
    s_bulk, mels_b, valid_b = multi.push_many(s_bulk, chunks, active)
    s_scan = multi.init()
    s_scan, mels_s, valid_s = multi.push_many(s_scan, chunks, active,
                                              scan=True)
    np.testing.assert_array_equal(valid_b, valid_s)
    np.testing.assert_allclose(
        mels_b[valid_b], mels_s[valid_s], atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(s_bulk.hop_buf[active]),
                               np.asarray(s_scan.hop_buf[active]))
    np.testing.assert_array_equal(np.asarray(s_bulk.idx),
                                  np.asarray(s_scan.idx))
    # inactive stream untouched
    assert np.asarray(s_bulk.hop_buf)[2].sum() == 0.0


def test_push_many_bulk_continues_across_calls(jfk_samples):
    """State carried across bulk calls equals one long bulk call."""
    config = MelConfig(400, 160, 80, 16000.0)
    multi = MultiStreamMel(config, 2, dtype=jnp.float64)
    chunks = np.stack([jfk_samples[:40 * 160].reshape(40, 160),
                       jfk_samples[8000:8000 + 40 * 160].reshape(40, 160)])
    s1 = multi.init()
    s1, mels_all, valid_all = multi.push_many(s1, chunks)
    s2 = multi.init()
    s2, m1, v1 = multi.push_many(s2, chunks[:, :15])
    s2, m2, v2 = multi.push_many(s2, chunks[:, 15:])
    np.testing.assert_allclose(
        np.concatenate([m1, m2], axis=1), mels_all, atol=1e-12
    )
    np.testing.assert_array_equal(
        np.concatenate([v1, v2], axis=1), valid_all
    )

def test_bf3_mode_bulk_matches_scan_and_reference(jfk_samples):
    """fft_impl='bf3' (3-pass rounded-bf16 slices, the batch headline
    backend's scheme) must keep bulk==scan differential parity and stay
    within ~1e-5 of the HIGHEST-precision rdft path in normalized mel
    units — the same accuracy class the driver's headline gate demands."""
    config = MelConfig(400, 160, 80, 16000.0)
    bf3 = MultiStreamMel(config, 2, fft_impl="bf3")
    ref = MultiStreamMel(config, 2, dtype=jnp.float64)
    h = 30
    chunks = np.stack([jfk_samples[: h * 160].reshape(h, 160),
                       jfk_samples[6400 : 6400 + h * 160].reshape(h, 160)])

    sb = bf3.init()
    sb, mels_b, valid_b = bf3.push_many(sb, chunks)
    ss = bf3.init()
    ss, mels_s, valid_s = bf3.push_many(ss, chunks, scan=True)
    np.testing.assert_array_equal(valid_b, valid_s)
    # bf16 matmul accumulation order may differ between the [S, fft] and
    # [S*H, fft] contraction shapes; the paths agree to ~bf16-slice ulp
    np.testing.assert_allclose(mels_b[valid_b], mels_s[valid_s], atol=1e-5)

    sr = ref.init()
    sr, mels_r, valid_r = ref.push_many(sr, chunks)
    np.testing.assert_array_equal(valid_b, valid_r)
    np.testing.assert_allclose(mels_b[valid_b], mels_r[valid_r], atol=1e-5)


def test_bulk_sig_matches_bulk_rdft():
    """fft_impl='sig' bulk path (fused kernel, in-kernel overlap-and-save
    framing, bf2 mel) vs the rdft bulk path: same emission semantics,
    values within the slice-scheme error class."""
    from melspec_tpu.config import MelConfig
    from melspec_tpu.streaming.multistream import MultiStreamMel

    cfg = MelConfig(400, 160, 80, 16000.0)
    rng = np.random.default_rng(0)
    chunks = (rng.normal(size=(4, 23, 160)) * 0.3).astype(np.float32)
    active = np.array([True, True, False, True])

    ref = MultiStreamMel(cfg, 4, fft_impl="rdft")
    sig = MultiStreamMel(cfg, 4, fft_impl="sig")
    st_r, mel_r, val_r = ref.push_many(ref.init(), chunks, active)
    st_s, mel_s, val_s = sig.push_many(sig.init(), chunks, active)

    np.testing.assert_array_equal(val_r, val_s)
    np.testing.assert_allclose(np.asarray(st_s.hop_buf),
                               np.asarray(st_r.hop_buf), atol=0)
    np.testing.assert_array_equal(np.asarray(st_s.idx),
                                  np.asarray(st_r.idx))
    # compare only emitted (valid) frames; bf2-vs-HIGHEST mel error class
    d = np.abs(mel_r - mel_s)[val_r]
    assert d.max() < 3e-5


def test_sig_instance_rejects_per_hop_paths():
    """fft_impl='sig' exists only on the bulk path; step/push/scan would
    silently serve rdft numerics from a 'sig' instance (a scan-vs-bulk
    differential would then compare two different error classes)."""
    import pytest

    from melspec_tpu.config import MelConfig

    multi = MultiStreamMel(MelConfig(400, 160, 80, 16000.0), 2,
                           fft_impl="sig")
    state = multi.init()
    chunks1 = np.zeros((2, 160), np.float32)
    with pytest.raises(NotImplementedError, match="bulk path"):
        multi.push(state, chunks1)
    with pytest.raises(NotImplementedError, match="bulk path"):
        multi.push_many(state, np.zeros((2, 3, 160), np.float32),
                        scan=True)
    # the bulk path itself still works (interpret-mode kernel on CPU)
    state, mels, valid = multi.push_many(
        state, np.zeros((2, 3, 160), np.float32))
    assert mels.shape == (2, 3, 80)


def test_flat_chunk_layout_matches_3d(jfk_samples):
    """The flat fast-path bulk layout ([S, H*hop] — the device never
    holds a [S, H, hop] tensor, killing the tick's retiling copy,
    tools/resample_probe4.py) must be bit-identical to the 3D API on
    the rdft bulk path, the scan path, and the composed serving tick."""
    from melspec_tpu.config import DetectionSettings, MelConfig
    from melspec_tpu.streaming.serving import MultiStreamFrontend

    cfg = MelConfig(400, 160, 80, 16000.0)
    s, h = 3, 12
    x = np.tile(np.asarray(jfk_samples)[: h * 160].reshape(1, -1),
                (s, 1)).astype(np.float32)
    x3 = x.reshape(s, h, 160)

    multi = MultiStreamMel(cfg, s)
    for scan in (False, True):
        st0 = multi.init()
        _, mels_a, valid_a = multi.push_many(st0, x3, scan=scan)
        _, mels_b, valid_b = multi.push_many(st0, x, scan=scan)
        np.testing.assert_array_equal(mels_a, mels_b)
        np.testing.assert_array_equal(valid_a, valid_b)

    front = MultiStreamFrontend(cfg, s, DetectionSettings())
    out_a = front.push_many(front.init(), x3)
    out_b = front.push_many(front.init(), x)
    for a, b in zip(out_a[1:], out_b[1:]):
        np.testing.assert_array_equal(a, b)
