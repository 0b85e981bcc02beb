"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by splitting the host
CPU into 8 XLA devices (SURVEY.md §4). Must run before `import jax`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
