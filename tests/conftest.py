"""Test configuration: CPU backend with 8 virtual devices, float64 enabled.

The multi-chip analog of the reference's "same binary under mpirun -n N"
story (SURVEY.md §4): sharding tests run on a virtual CPU mesh; numerical
golden tests run in f64, which the CPU backend executes natively.
"""

import os

# Must be configured before jax initializes a backend.  The axon
# sitecustomize pins JAX_PLATFORMS=axon (the real TPU), so we override via
# jax.config, which takes precedence.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The XLA CPU compiler segfaults intermittently deep into the 200+-test
    single-process run (observed twice around test #160, each time inside
    backend_compile, with >120 GB RAM free); clearing the jit caches between
    modules keeps the compiler state small and has eliminated the crash in
    practice.  Costs a few recompiles of shared tiny programs.
    """
    yield
    jax.clear_caches()
