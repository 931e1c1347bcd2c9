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
