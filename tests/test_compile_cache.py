"""utils/cache.enable_compile_cache — the persistent-compilation-cache
switch every CLI flips (round-5 dress rehearsal: compiles, not FLOPs,
dominate corpus-scale cost; caching them across processes makes --stage
resumes and re-runs compile-free)."""

import os


def test_enable_compile_cache(tmp_path, monkeypatch):
    import jax

    from speech_recognition_tools_tpu.utils.cache import enable_compile_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        monkeypatch.delenv("SRT_COMPILE_CACHE", raising=False)
        p = enable_compile_cache(str(tmp_path / "cc"))
        assert p == str(tmp_path / "cc") and os.path.isdir(p)
        assert jax.config.jax_compilation_cache_dir == p

        # explicit JAX env var wins and is left alone
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/elsewhere")
        assert enable_compile_cache() == "/elsewhere"

        # SRT_COMPILE_CACHE=0 disables
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        monkeypatch.setenv("SRT_COMPILE_CACHE", "0")
        assert enable_compile_cache() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
