"""Persistent XLA compilation cache.

The reference pays its CUDA-extension build cost once at install time; the
TPU analogue of that cost is XLA compilation, paid on every process start
(20-40 s per program on a v5e, worse through a remote-chip tunnel). Enabling
JAX's persistent compilation cache makes every CLI / bench / eval restart
after the first reuse the compiled executables, so two-phase evaluation and
repeated inference sessions start in seconds.

Opt out with FPC_NO_COMPILATION_CACHE=1 (e.g. when benchmarking compile
time itself). The cache location can be moved with JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Idempotent; call before the first jit execution (not before import)."""
    if os.environ.get("FPC_NO_COMPILATION_CACHE"):
        return
    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend != "tpu":
        # CPU compiles are quick, and XLA:CPU AOT entries are pinned to the
        # compiling host's machine features (SIGILL risk if the cache dir
        # travels between hosts). TPU executables are portable per chip
        # generation and cost 20-40 s each — cache only those.
        return

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "fastposecnn_tpu", "xla_cache",
        ),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache EVERY compile: through a remote-chip tunnel even a trivial
        # eager op costs ~0.4 s to AOT-compile, and host code paths can
        # dispatch hundreds of them (measured ~200 s of an eval sweep before
        # phase B moved to numpy). Entries are a few KB each.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        # Older jax or read-only filesystem: run uncached rather than fail.
        pass
