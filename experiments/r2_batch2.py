"""Round-2 TPU batch 2: mxu3 micro + production bench at r=6 and r=7.

r=7 (135M DoFs) was impossible in round 1: masks embedded as 540 MB HLO
constants blew the remote-compile relay limit (HTTP 413).  With separable
mask/diagonal storage the captured constants are O(N) 1D vectors.
"""

import json
import os

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.utils.profiling import measure_op

sp = FESpace(HyperCubeMesh(3, 6), 4)
u = jax.random.normal(jax.random.PRNGKey(0), sp.grid_shape, jnp.float32)
op = make_pallas_laplace(sp, jnp.float32, bx=16, by=16, core="mxu3")
t = measure_op(op.apply, u)
print(json.dumps({"case": "mxu3_16x16_r6", "ms": t * 1e3,
                  "gdof_s": sp.n_dofs / t / 1e9}), flush=True)
del op, u

import bench

for r in (6, 7):
    os.environ["PMG_BENCH_REFINEMENTS"] = str(r)
    print(f"--- bench r={r} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001 - record and continue
        print(json.dumps({"bench_r": r, "error": repr(e)[:500]}), flush=True)
