"""Persistent XLA compilation cache.

A cold CSWin-SimAM-UNet train-step compile on TPU takes many minutes; the
reference pays nothing comparable (torch eager), so an uncached CLI start is
a real regression in user experience.  JAX's persistent compilation cache
keys on the HLO, so re-running the same config skips compilation entirely
while any model/config change recompiles exactly what changed.

Enabled by default by the CLI and bench; opt out with
``CSWIN_TPU_NO_COMPILE_CACHE=1`` or point ``JAX_COMPILATION_CACHE_DIR``
somewhere else.
"""

from __future__ import annotations

import os

import jax

# Repo-local (gitignored) so the cache survives VM/tmpfs resets between
# sessions — a cold flagship train-step compile through the remote-TPU
# tunnel is ~14 min, a warm one is seconds.  The repo-local path is only
# used when the resolved root actually IS a repo checkout (marker check):
# for an installed site-packages copy we fall back to /tmp rather than
# silently creating site-packages/.cache.  Directory resolution happens
# lazily inside enable_compilation_cache() — importing this module has no
# filesystem side effects.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def default_cache_dir() -> str:
    """Resolve (and create) the default cache dir; no import-time effects."""
    if os.path.exists(os.path.join(_REPO_ROOT, "bench.py")) or \
            os.path.isdir(os.path.join(_REPO_ROOT, ".git")):
        cand = os.path.join(_REPO_ROOT, ".cache", "jax_tpu")
    else:
        cand = "/tmp/jax_comp_cache"
    try:
        os.makedirs(cand, exist_ok=True)
        return cand
    except OSError:
        return "/tmp/jax_comp_cache"


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compile cache (idempotent). Returns the dir."""
    if os.environ.get("CSWIN_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or default_cache_dir())
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
