"""Persistent XLA compilation cache for the CLI surface.

At corpus scale the pipeline cost is dominated by one-time program
compiles (multi-minute through a remote-compile TPU runtime — measured
in the round-5 dress rehearsal: 95% of a bounded training stage). JAX
can persist compiled executables across processes; every CLI calls
`enable_compile_cache()` so a re-run, a --stage resume, or the next
epoch-shape ever only compiles once per machine.

Resolution order: an explicit path argument, `$JAX_COMPILATION_CACHE_DIR`
(already handled by JAX itself — we leave it alone), `$SRT_COMPILE_CACHE`,
else `<cwd>/.cache/jax`.
"""

import os


def enable_compile_cache(path: str | None = None) -> str | None:
    """Idempotent; returns the cache dir in use (None if disabled).

    Set SRT_COMPILE_CACHE=0 to disable.
    """
    env = os.environ.get("SRT_COMPILE_CACHE")
    if env == "0":
        return None
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    path = path or env or os.path.join(os.getcwd(), ".cache", "jax")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
