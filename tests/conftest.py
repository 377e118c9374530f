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

# persistent compile cache: the closed-loop episode graphs take minutes to
# compile on the 2-core test host, and the CPU backend_compile occasionally
# aborts outright on them (observed SIGSEGV/SIGABRT deep in XLA) — cached
# executables sidestep both on reruns
from cmw_tpu.runtime.cache import enable_persistent_cache

enable_persistent_cache()

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The CPU backend reproducibly SIGSEGV/SIGABRTs (deep in XLA, at
    compile or at persistent-cache deserialization) once ~8-10 of the
    multi-megabyte closed-loop episode executables are resident in one
    process; each alone loads fine. Dropping the in-memory pjit caches
    between modules keeps residency low — reloads come from the disk
    cache above."""
    yield
    import jax

    jax.clear_caches()
