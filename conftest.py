"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated on host CPU devices (the reference has
no distributed story to test; SURVEY.md §4 implication (d)).

Note: this machine's axon TPU plugin force-sets ``jax_platforms="axon,cpu"``
from sitecustomize at interpreter start, so the env var alone is not enough —
we must re-override via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
