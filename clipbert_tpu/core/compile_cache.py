"""Persistent XLA compilation cache.

Full-model train steps (R50 + 12-layer BERT fwd+bwd in one program) take
minutes to compile on a small host; the persistent cache makes every rerun
(benchmarks, restarts, the driver's compile checks) hit disk instead.
Call once at process start; safe to call repeatedly.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/clipbert_tpu_xla")
_enabled = False


def enable(cache_dir: str = _DEFAULT_DIR) -> None:
    global _enabled
    if _enabled:
        return
    import jax
    try:
        # CPU AOT cache entries are machine-feature-sensitive (loading one
        # compiled with different CPU features risks SIGILL) — only cache
        # accelerator compiles.
        if jax.default_backend() == "cpu":
            return
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        _enabled = True
    except Exception:  # older jax without the knobs: best-effort
        pass
