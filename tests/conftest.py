"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding logic is validated on host CPU with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4d: multi-chip tests
on CPU via device-count override — no real cluster needed).
"""

import os

# The axon sitecustomize registers a TPU-tunnel PJRT backend whenever
# PALLAS_AXON_POOL_IPS is set, overriding JAX_PLATFORMS=cpu. Tests must run
# on the local host CPU (fast, 8 virtual devices), so drop it before any jax
# import.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The sitecustomize imports jax at interpreter start (before this conftest),
# so jax's config already captured JAX_PLATFORMS=axon from the environment.
# Setting the env var above is then not enough — override the live config so
# the suite really runs on host CPU, not through the TPU tunnel (measured:
# a tunnel run is ~50x slower and trips bf16/f32-precision assertions).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
