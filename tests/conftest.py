"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
CPU backend to expose 8 devices (the TPU-equivalent of testing MPI logic
without a cluster; cf. SURVEY.md section 4). The `axon` TPU-tunnel platform
ignores JAX_PLATFORMS=cpu, so the env var is removed and the platform forced
via jax.config before any test imports jax."""

import os

os.environ.pop("JAX_PLATFORMS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
