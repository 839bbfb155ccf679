"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on a host-platform mesh exactly as the reference CI fakes multi-node
MPI with oversubscribed ranks + MAX_NODE_SIZE (reference: ci.yml:104).

Note: the environment's sitecustomize registers a remote 'axon' TPU backend at
interpreter start, so JAX_PLATFORMS env alone is not enough — we must override
the platform through jax.config after import.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# signals artis_tpu/__init__ to skip the persistent compilation cache (the
# XLA:CPU AOT cache is machine-feature-fragile); the jax.config call below is
# still required because sitecustomize forces the axon platform
os.environ["JAX_PLATFORMS"] = "cpu"
# don't let the axon plugin open tunnel connections from CPU-only test
# processes (a concurrent benchmark process may hold the remote TPU)
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after every test module: a full-suite run
    compiles many hundreds of XLA:CPU programs in one process, and the LLVM
    JIT eventually segfaults in backend_compile_and_load once too much
    compiled state has accumulated (observed deterministically at ~47% of
    the suite). Per-module cache clearing keeps the live-executable count
    bounded; fixtures that outlive the clear simply recompile on next use."""
    yield
    import jax as _jax

    _jax.clear_caches()
