"""Round-4 TPU batch 12: mxu3 resid3t probe at r=7 (512 lanes).

The r=7 fused smoother's entry (residual3t) runs on the banded 8x8 exact
core at 12.3 ms/pass, ~3 passes per cycle.  mxu3 (hi/lo bf16, f32-grade,
already the EXACT-role rescue at Q6/Q7 with golden-count parity) rides
the MXU instead of the VPU — if a 16x8 or 8x8 mxu3 kernel compiles the
residual3t mode at 512 lanes and beats 12.3 ms, swapping the resid3 twin
at >256 lanes is a direct cycle saving (no new kernel code).

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import (
    laplace_compile_ok,
    make_pallas_laplace,
    pallas_eligible,
)
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32

sp = FESpace(HyperCubeMesh(3, 7), 4)
m1 = jnp.asarray(sp.free_mask_1d(), f32)
u = jax.random.normal(jax.random.PRNGKey(0), sp.grid_shape, f32)
for d in range(3):
    shp = [1, 1, 1]
    shp[d] = m1.shape[0]
    u = u * m1.reshape(shp)

for bx, by in ((16, 8), (8, 8)):
    if not pallas_eligible(sp, bx, by):
        continue
    op = make_pallas_laplace(sp, f32, bx=bx, by=by, core="mxu3")
    ok = laplace_compile_ok(op, modes=("apply", "residual1t", "residual3t"))
    rec = {"case": f"mxu3_{bx}x{by}_r7", "ok": bool(ok)}
    if ok:
        t = measure_op(op.apply, u, iterations=(2, 6), repeats=3)
        rec["apply_ms"] = t * 1e3
        rec["apply_gdofs"] = sp.n_dofs / t / 1e9
    print(json.dumps(rec), flush=True)
print("batch12 done", flush=True)
