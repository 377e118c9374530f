"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated the same way the driver's dryrun does —
`--xla_force_host_platform_device_count` fakes an 8-device mesh on CPU
(real TPU hardware is reserved for bench.py). Note: this environment forces
JAX_PLATFORMS=axon via sitecustomize, so the env var alone is not enough —
we must use jax.config before any backend is initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
