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
