"""Persistent XLA compilation-cache enablement.

The 620px HRNet graphs cold-compile in minutes over this environment's
remote-compile tunnel; a persistent on-disk cache makes every subsequent
process start instantly. Called from Trainer/Evaluator/bench/graft-entry;
safe to call multiple times and after backend init (best-effort).
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(cache_dir: str = None) -> None:
    try:
        import jax

        d = cache_dir or os.environ.get("RHSS_JAX_CACHE", _DEFAULT)
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
