"""Persistent XLA compilation-cache helper.

The fused pipelines compile once per (program, shape); on a remote TPU
runtime that first compile can take minutes. XLA's persistent
compilation cache serializes the compiled executable to disk so LATER
PROCESSES skip the compile entirely — measured in this environment: a
fresh process re-running an already-cached program starts in under a
second instead of a ~minute compile. The example CLIs and the serving
loop enable it by default (opt out with MELSPEC_TPU_NO_COMPILE_CACHE=1);
library importers call :func:`enable_compilation_cache` explicitly —
the package never mutates global jax config on import.
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(path: Optional[str] = None) -> Optional[str]:
    """Point jax at a persistent on-disk compilation cache.

    Respects an already-configured cache (user config or
    ``JAX_COMPILATION_CACHE_DIR``); disabled entirely when
    ``MELSPEC_TPU_NO_COMPILE_CACHE=1``. Returns the cache directory in
    use, or ``None`` when disabled."""
    if os.environ.get("MELSPEC_TPU_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "melspec_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
