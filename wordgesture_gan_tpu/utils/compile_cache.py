"""Persistent XLA compilation cache.

The framework fuses whole epochs and whole metric passes into single XLA
programs (see ARCHITECTURE.md dispatch rules) — great steady-state, but each
program costs a one-time compile (tens of seconds for the scan-fused train
epoch or the DTW matrix program). The reference has no equivalent concern
(eager torch). Enabling JAX's on-disk compilation cache makes every CLI
restart, resume, and eval re-run skip compiles it has seen before.

Cache location: $WGG_COMPILE_CACHE, else ~/.cache/wordgesture_gan_tpu/xla.
Set WGG_COMPILE_CACHE=0 to disable.
"""

from __future__ import annotations

import os
from pathlib import Path

_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None, verbose: bool = False) -> str | None:
    """Idempotently point JAX at an on-disk compilation cache. Returns the
    cache path, or None when disabled. Safe to call before or after other
    jax use (config keys only; no device touch)."""
    global _ENABLED
    env = os.environ.get("WGG_COMPILE_CACHE")
    if env == "0":
        return None
    path = Path(cache_dir or env or Path.home() / ".cache" / "wordgesture_gan_tpu" / "xla")
    if _ENABLED:
        return str(path)

    import jax

    try:
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # Cache anything non-trivial. XLA's per-executable compile clock is
        # well under wall-clock (tracing excluded), so a high threshold
        # silently caches nothing — measured: the DTW program (2.2s wall)
        # writes zero entries at 2.0s threshold, all entries at 0.1s.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        # Skip tiny entries: XLA:CPU AOT results (~4-10 KB here, from
        # host-side init programs) refuse to re-load in this XLA version
        # (tuning flags like +prefer-no-scatter are compared as machine
        # features), so caching them only produces load-error spam. Real
        # TPU programs measure 100 KB - 120 MB.
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 64 * 1024)
        # Bound the directory (epoch-program entries are ~119 MB each).
        jax.config.update("jax_compilation_cache_max_size", 4 * 1024**3)
        _ENABLED = True
    except Exception:  # unknown config key on an old jax — degrade silently
        return None
    if verbose:
        from .logging import log

        log(f"XLA compilation cache: {path}")
    return str(path)
