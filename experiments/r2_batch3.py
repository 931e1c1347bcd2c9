"""Round-2 TPU batch 3: production bench with the fully fused Chebyshev
smoother (kernel-fused residual + recurrence, bf16 MXU core) at r=6 and r=7,
plus a micro-benchmark of one fused smoothing step."""

import json
import os

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev
from portable_multigrid_tpu.utils.profiling import measure_op

sp = FESpace(HyperCubeMesh(3, 6), 4)
exact = make_pallas_laplace(sp, jnp.float32, bx=16, by=16, core="banded")
mxu = make_pallas_laplace(sp, jnp.float32, bx=16, by=16, core="mxu")
sm = FusedChebyshev(
    degree=5, op=exact, op_smooth=mxu,
    theta=jnp.asarray(1.3, jnp.float32), delta=jnp.asarray(0.9, jnp.float32),
)
b = jax.random.normal(jax.random.PRNGKey(0), sp.grid_shape, jnp.float32)
u = jax.random.normal(jax.random.PRNGKey(1), sp.grid_shape, jnp.float32)

t = measure_op(lambda v: sm.smooth(v, b), u, iterations=(2, 6))
print(json.dumps({"case": "fused_smooth_r6", "ms": t * 1e3}), flush=True)
t = measure_op(sm.apply, b, iterations=(2, 6))
print(json.dumps({"case": "fused_cheb_apply_r6", "ms": t * 1e3}), flush=True)
del exact, mxu, sm, b, u

import bench

for r in (6, 7):
    os.environ["PMG_BENCH_REFINEMENTS"] = str(r)
    print(f"--- bench r={r} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench_r": r, "error": repr(e)[:2000]}), flush=True)
