"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU path is exercised by
bench.py / __graft_entry__.py.

Note: the environment's sitecustomize imports jax at interpreter startup, so
JAX_PLATFORMS must be overridden through jax.config, not os.environ.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
