"""Serving-fleet checkpoint/resume (streaming/state_io.py).

The property that matters: a frontend restored from a checkpoint produces
BIT-IDENTICAL outputs to the uninterrupted run — mid-utterance windows,
VAD history, warm-up counters, and resampler tails all survive the
round-trip. Plus the guard rails: structure, shape, and config-meta
mismatches fail loudly instead of resuming on a corrupted frame grid.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from melspec_tpu.config import DetectionSettings, MelConfig
from melspec_tpu.streaming.serving import (MultiStreamFrontend,
                                           SourceRateFrontend)
from melspec_tpu.streaming.state_io import (load_stream_state,
                                            save_stream_state)

S, H = 4, 6
CFG = MelConfig(400, 160, 80, 16000.0)


def _chunks(rng, n_hops, width=CFG.hop_size):
    return rng.standard_normal((S, n_hops, width)).astype(np.float32) * 0.1


def _outputs(front, state, chunks):
    state, q, lo, hi, va, valid = front.push_many(state, chunks)
    return state, (q, lo, hi, va, valid)


def test_frontend_resume_bit_identical(tmp_path):
    rng = np.random.default_rng(0)
    a, b = _chunks(rng, H), _chunks(rng, H)
    front = MultiStreamFrontend(CFG, S)

    state, _ = _outputs(front, front.init(), a)
    front.save_state(tmp_path / "ck.npz", state)

    # uninterrupted continuation
    _, ref = _outputs(front, state, b)

    # a fresh process would build a fresh frontend: same config, new object
    front2 = MultiStreamFrontend(CFG, S)
    resumed = front2.load_state(tmp_path / "ck.npz")
    _, got = _outputs(front2, resumed, b)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_source_rate_resume_bit_identical(tmp_path):
    rng = np.random.default_rng(1)
    front = SourceRateFrontend(CFG, S, input_rate=48000)
    a = _chunks(rng, H, front.hop_src)
    b = _chunks(rng, H, front.hop_src)

    state, _ = _outputs(front, front.init(), a)
    front.save_state(tmp_path / "ck.npz", state)
    _, ref = _outputs(front, state, b)

    front2 = SourceRateFrontend(CFG, S, input_rate=48000)
    _, got = _outputs(front2, front2.load_state(tmp_path / "ck.npz"), b)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))


def test_reject_wrong_fleet_size(tmp_path):
    front = MultiStreamFrontend(CFG, S)
    front.save_state(tmp_path / "ck.npz", front.init())
    bigger = MultiStreamFrontend(CFG, S + 1)
    with pytest.raises(ValueError, match="n_streams|leaf|meta|mismatch"):
        bigger.load_state(tmp_path / "ck.npz")


def test_reject_wrong_structure(tmp_path):
    plain = MultiStreamFrontend(CFG, S)
    src = SourceRateFrontend(CFG, S, input_rate=48000)
    plain.save_state(tmp_path / "ck.npz", plain.init())
    with pytest.raises(ValueError, match="structure|meta|mismatch"):
        src.load_state(tmp_path / "ck.npz")


def test_reject_config_drift(tmp_path):
    front = MultiStreamFrontend(CFG, S)
    front.save_state(tmp_path / "ck.npz", front.init())
    # same state SHAPES (hop size is not part of the state), different
    # frame grid — only the meta check can catch this
    other = MultiStreamFrontend(MelConfig(400, 200, 80, 16000.0), S)
    with pytest.raises(ValueError, match="config mismatch"):
        other.load_state(tmp_path / "ck.npz")
    # and different VAD settings change decision semantics
    other2 = MultiStreamFrontend(
        CFG, S, settings=DetectionSettings(min_energy=0.5))
    with pytest.raises(ValueError, match="config mismatch"):
        other2.load_state(tmp_path / "ck.npz")


def test_reject_non_checkpoint(tmp_path):
    np.savez(tmp_path / "junk.npz", a=np.zeros(3))
    front = MultiStreamFrontend(CFG, S)
    with pytest.raises(ValueError, match="not a melspec stream checkpoint"):
        front.load_state(tmp_path / "junk.npz")


def test_extensionless_path_roundtrip(tmp_path):
    """np.savez appends '.npz' to extensionless paths; save/load must
    agree on the final filename instead of saving to one file and
    loading another."""
    front = MultiStreamFrontend(CFG, S)
    front.save_state(tmp_path / "ckpt", front.init())
    assert (tmp_path / "ckpt.npz").is_file()
    st = front.load_state(tmp_path / "ckpt")  # validates structure itself
    assert np.asarray(st.mel.hop_buf).shape == (S, CFG.fft_size)
    # and no stray temp file from the atomic-replace path
    assert sorted(p.name for p in tmp_path.iterdir()) == ["ckpt.npz"]


def test_save_preserves_previous_checkpoint_on_failure(tmp_path, monkeypatch):
    """Atomicity: a crash mid-save must leave the previous good
    checkpoint intact (write-to-temp + os.replace)."""
    import melspec_tpu.streaming.state_io as sio

    front = MultiStreamFrontend(CFG, S)
    path = tmp_path / "fleet.npz"
    front.save_state(path, front.init())
    good = path.read_bytes()

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(sio.np, "savez", boom)
    with pytest.raises(OSError, match="disk full"):
        front.save_state(path, front.init())
    assert path.read_bytes() == good
    assert sorted(p.name for p in tmp_path.iterdir()) == ["fleet.npz"]


def test_generic_roundtrip_no_meta(tmp_path):
    state = {"x": jnp.arange(5, dtype=jnp.int32),
             "y": (jnp.ones((2, 3)), jnp.zeros(1, bool))}
    save_stream_state(tmp_path / "s.npz", state)
    out = load_stream_state(tmp_path / "s.npz", like=state)
    for r, g in zip((state["x"], *state["y"]), (out["x"], *out["y"])):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g))
        assert np.asarray(r).dtype == np.asarray(g).dtype


def test_corrupt_checkpoint_files_fail_cleanly(tmp_path):
    """Truncated/garbage checkpoint files raise ValueError with a clear
    message instead of leaking zipfile internals or KeyErrors."""
    front = MultiStreamFrontend(CFG, S)
    good = tmp_path / "good.npz"
    front.save_state(good, front.init())

    garbage = tmp_path / "garbage.npz"
    garbage.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="corrupt|not an .npz"):
        front.load_state(garbage)

    truncated = tmp_path / "truncated.npz"
    truncated.write_bytes(good.read_bytes()[: good.stat().st_size // 2])
    with pytest.raises(ValueError, match="corrupt|truncated|missing"):
        front.load_state(truncated)

    empty = tmp_path / "empty.npz"
    empty.write_bytes(b"")
    with pytest.raises(ValueError, match="corrupt|not an .npz"):
        front.load_state(empty)
