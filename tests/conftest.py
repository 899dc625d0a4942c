"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
(DP mesh, collectives) is exercised without TPU hardware.

Note: this environment's sitecustomize pins `jax_platforms=axon,cpu` (TPU
tunnel), so the JAX_PLATFORMS env var alone is not enough — we override the
config explicitly before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
