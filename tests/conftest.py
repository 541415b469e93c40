"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding is tested without TPU hardware the standard JAX way
(SURVEY.md §4e): xla_force_host_platform_device_count=8 on the CPU backend.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
