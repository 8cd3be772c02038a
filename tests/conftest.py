"""Test harness config: run everything on a simulated 8-device CPU mesh.

Set before jax import so pjit/sharding tests exercise real multi-device
partitioning without TPU hardware (SURVEY.md §4.4).
"""

import os

# NB: in this image the axon TPU plugin ignores JAX_PLATFORMS; the legacy
# JAX_PLATFORM_NAME (and jax.config jax_platforms) do force CPU.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"  # must OVERRIDE the image's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite's wall time is dominated by CPU
# XLA compiles of whole CSWin models (~15 of the 18 min); cache keys are
# HLO-derived so edits invalidate exactly what they change and re-runs of
# unchanged tests skip compilation entirely.  Repo-local (gitignored) so
# it survives VM/tmpfs resets between sessions.
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax_cpu")
try:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except OSError:
    pass  # read-only checkout: lose the cache, not the suite

assert jax.devices()[0].platform == "cpu", jax.devices()
