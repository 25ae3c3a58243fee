"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

Mirrors the driver's multi-chip dry-run environment
(XLA_FLAGS=--xla_force_host_platform_device_count=N, JAX_PLATFORMS=cpu).
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run on local CPU — override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# sitecustomize.py (axon TPU tunnel) force-sets jax_platforms="axon,cpu" at
# interpreter startup; route tests to local CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
