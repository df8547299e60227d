"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
CPU backend to expose 8 devices (the TPU-equivalent of testing MPI logic
without a cluster; cf. SURVEY.md section 4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
