"""Shared early --platform handling for the example CLIs.

Must run BEFORE any melspec_tpu import (jax platform config is
load-time). Handles both argparse forms — ``--platform cpu`` and
``--platform=cpu`` — where the old per-script sniff silently ignored the
``=`` form (the script then grabbed the default backend, e.g. the TPU
tunnel) and IndexError'd on a trailing bare ``--platform``.
"""

from __future__ import annotations

import sys


def apply_platform_flag(argv=None) -> None:
    argv = sys.argv if argv is None else argv
    value = None
    for i, tok in enumerate(argv):
        if tok == "--platform":
            if i + 1 >= len(argv):
                sys.exit("--platform requires a value (e.g. cpu)")
            value = argv[i + 1]
        elif tok.startswith("--platform="):
            value = tok.split("=", 1)[1]
    if value:
        import jax

        jax.config.update("jax_platforms", value)
    # persistent compile cache: later CLI runs skip the (potentially
    # minutes-long remote) compiles; opt out with
    # MELSPEC_TPU_NO_COMPILE_CACHE=1
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from melspec_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
