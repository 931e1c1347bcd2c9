"""Round-2 TPU batch 5: hyb3 exact core, transfer engines, r=7 with scanned
fused smoother steps."""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.ops.transfer import make_h_transfer
from portable_multigrid_tpu.utils.profiling import measure_op

sp = FESpace(HyperCubeMesh(3, 6), 4)
u = jax.random.normal(jax.random.PRNGKey(0), sp.grid_shape, jnp.float32)

for core in ("hyb3",):
    op = make_pallas_laplace(sp, jnp.float32, bx=16, by=16, core=core)
    t = measure_op(op.apply, u)
    print(json.dumps({"case": f"{core}_16x16_r6", "ms": t * 1e3,
                      "gdof_s": sp.n_dofs / t / 1e9}), flush=True)
    del op

c = FESpace(HyperCubeMesh(3, 5), 4)
tr = make_h_transfer(c, sp, jnp.float32)
cv = jax.random.normal(jax.random.PRNGKey(2), c.grid_shape, jnp.float32)
for name in ("dot", "unrolled"):
    t = dataclasses.replace(tr, algo=name)
    tp = measure_op(lambda v, t=t: t.restrict(t.prolongate(v)), cv,
                    iterations=(2, 8))
    print(json.dumps({"case": f"transfer_pair_{name}", "pair_ms": tp * 1e3}),
          flush=True)
del tr, cv

import bench

for r in (7,):
    os.environ["PMG_BENCH_REFINEMENTS"] = str(r)
    print(f"--- bench r={r} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench_r": r, "error": repr(e)[:1200]}), flush=True)
