"""r5 batch 1: does the JAX persistent compilation cache work on axon?

Runs the same small jit+pallas program in this process with the cache dir
enabled; prints compile-time stats.  Run TWICE (two processes): if the
second process's compile is ~instant and the cache dir has entries, the
persistent cache works through the tunneled backend and bench.py should
enable it.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r5_batch1.py
"""

import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/pmg/xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh  # noqa: E402
from portable_multigrid_tpu.fem.space import FESpace  # noqa: E402
from portable_multigrid_tpu.ops.pallas_laplace import (  # noqa: E402
    make_pallas_laplace,
)


def main():
    print("devices:", jax.devices(), flush=True)
    mesh = HyperCubeMesh(3, 5)  # 32^3 cells, Q4 -> 128 lanes
    sp = FESpace(mesh, 4)
    op = make_pallas_laplace(sp, jnp.float32, bx=16, by=16, core="banded")

    t0 = time.time()
    f = jax.jit(lambda u: op.apply(u).ravel()[0])
    c = f.lower(jax.ShapeDtypeStruct(op.grid_shape, jnp.float32)).compile()
    t1 = time.time()
    print(f"pallas compile: {t1 - t0:.1f}s", flush=True)

    # a plain XLA program too (different cache pathway)
    t0 = time.time()
    g = jax.jit(lambda u: (u @ u.T).sum())
    g.lower(jax.ShapeDtypeStruct((512, 512), jnp.float32)).compile()
    t1 = time.time()
    print(f"xla compile: {t1 - t0:.1f}s", flush=True)

    d = "/root/.cache/pmg/xla_cache"
    n = len(os.listdir(d)) if os.path.isdir(d) else 0
    print(f"cache entries: {n}", flush=True)


if __name__ == "__main__":
    main()
