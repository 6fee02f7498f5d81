"""Test harness: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (the TPU answer to "test
multi-node without a cluster").  The ambient environment may pin a real TPU
platform (JAX_PLATFORMS=axon); tests must be hermetic and fast, so we force
the CPU backend through jax.config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
