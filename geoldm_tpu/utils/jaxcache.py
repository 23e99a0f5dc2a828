"""Persistent XLA compilation cache setup.

Large eval programs (e.g. the t0_always NLL estimator at batch 250) take
minutes to compile through a remote-compile tunnel; the persistent cache
makes every warm start free. Called by every CLI entry point after the
first ``import jax``. Opt out with GEOLDM_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/geoldm_tpu/xla")


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    if os.environ.get("GEOLDM_NO_COMPILE_CACHE") == "1":
        return
    import jax

    try:
        # CPU AOT cache entries are machine-feature-sensitive (reloading one
        # compiled with different detected features warns about possible
        # SIGILL); compiles are cheap on CPU anyway — cache TPU only.
        if jax.default_backend() == "cpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir", cache_dir or _DEFAULT_DIR
        )
        # Cache everything that took meaningful compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - backend without cache support
        print(f"persistent compilation cache unavailable: {e}")
