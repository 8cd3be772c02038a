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

assert jax.devices()[0].platform == "cpu", jax.devices()
