"""Round-4 TPU batch 11: banded block-shape re-measure at r=7 (512 lanes).

Round 3 (old toolchain) measured banded 8x8 fastest at 512 lanes (11.7 ms
apply vs 12.6 at 16x8), and 16x16 banded crashed Mosaic above 256 lanes,
so make_laplace_auto's >256-lane banded candidate list is (8,8) only.
The 2026-08 toolchain lifted the 16x16 cheb2-pair crash (batch5: 16x16
pairs FASTEST) — re-probe the banded operator kernels at the same shapes:
apply + residual3t (the fused smoother entry, ~4 passes per r=7 cycle).

If 16x16 or 16x8 banded compiles and beats 8x8, the auto ladder's r=7
row gains a few ms (cycle currently 141.6 ms = 9.54e8 DoF/s).

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

sp = FESpace(HyperCubeMesh(3, 7), 4)  # 512 lanes, 135M DoF
m1 = jnp.asarray(sp.free_mask_1d(), f32)
u = jax.random.normal(jax.random.PRNGKey(0), sp.grid_shape, f32)
for d in range(3):
    shp = [1, 1, 1]
    shp[d] = m1.shape[0]
    u = u * m1.reshape(shp)

for bx, by in ((8, 8), (16, 8), (16, 16)):
    if not pallas_eligible(sp, bx, by):
        print(json.dumps({"case": f"banded_{bx}x{by}", "eligible": False}),
              flush=True)
        continue
    op = make_pallas_laplace(sp, f32, bx=bx, by=by, core="banded")
    ok = laplace_compile_ok(op, modes=("apply", "residual1t", "residual3t"))
    rec = {"case": f"banded_{bx}x{by}_r7", "ok": bool(ok)}
    if ok:
        t = measure_op(op.apply, u, iterations=(2, 6), repeats=3)
        rec["apply_ms"] = t * 1e3
        rec["apply_gdofs"] = sp.n_dofs / t / 1e9
    print(json.dumps(rec), flush=True)
print("batch11 done", flush=True)
