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
