"""Utility-layer tests (compile cache, profiling helpers)."""

def test_enable_compilation_cache(tmp_path, monkeypatch):
    """The persistent-cache helper must honor the opt-out, respect an
    already-configured cache dir, and otherwise create + set its own."""
    import jax

    from melspec_tpu.utils.compile_cache import enable_compilation_cache

    prior = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("MELSPEC_TPU_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache(str(tmp_path / "a")) is None

        monkeypatch.delenv("MELSPEC_TPU_NO_COMPILE_CACHE", raising=False)
        jax.config.update("jax_compilation_cache_dir",
                          str(tmp_path / "pre"))
        assert enable_compilation_cache(str(tmp_path / "b")) == \
            str(tmp_path / "pre")  # respects existing config

        jax.config.update("jax_compilation_cache_dir", None)
        got = enable_compilation_cache(str(tmp_path / "c"))
        assert got == str(tmp_path / "c")
        assert (tmp_path / "c").is_dir()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "c")
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)


def test_iter_pcm_f32le_carries_partial_floats():
    """The stdin PCM reader must carry a partial trailing float into the
    next chunk (never drop mid-stream bytes) and discard only a malformed
    1-3-byte EOF tail, like the reference's chunks_exact."""
    import io

    import numpy as np

    from melspec_tpu.io.wav import iter_pcm_f32le

    want = np.arange(100, dtype="<f4")

    class Dribble(io.RawIOBase):
        """Returns SHORT, misaligned reads (7 bytes at a time)."""

        def __init__(self, data):
            self.data, self.pos = data, 0

        def read(self, n):
            out = self.data[self.pos : self.pos + 7]
            self.pos += len(out)
            return out

    got = np.concatenate(list(iter_pcm_f32le(Dribble(want.tobytes()))))
    np.testing.assert_array_equal(got, want)
    # dangling EOF tail is dropped, everything before it kept
    got2 = np.concatenate(
        list(iter_pcm_f32le(io.BytesIO(want.tobytes() + b"\x01\x02"))))
    np.testing.assert_array_equal(got2, want)
    assert list(iter_pcm_f32le(io.BytesIO(b""))) == []
