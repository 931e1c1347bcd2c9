"""Round-4 TPU batch 10: elasticity variant shoot-out at r=6 (N=193).

batch9 findings: variant="dense" (single element matmul) loses to kron at
BOTH r=5 (apply 1.18 vs 0.46 ms) and r=6 (20.5 ms apply, 422 ms cycle vs
kron's 211) — the interleaved element gather/scatter layout shuffles
dominate, not the matmul (2.4 GFLOP at r=5 would be ~0.05 ms at MXU
peak).  Remaining candidate at large N: variant="sumfac" shares all
collocation/gradient stages across the 9 tensor blocks (2*dim^2 1D
contractions total) where kron runs 21 independent O(N^4) chains — the
FLOP ratio flips in sumfac's favour at N=193 IF XLA schedules the
element pipeline tolerably.

Also captures the isolated kron r=6 apply (for the cycle budget: 211 ms
cycle implies ~8 ms; never measured directly).

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid
from portable_multigrid_tpu.solvers.vcycle import VCycle
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32


def bench_elasticity(r, variant, cycle=True):
    model = ElasticityMultigrid(3, 3, r, dtype=f32, variant=variant)
    fine = model.spaces[-1]
    dim = fine.dim
    b = jax.random.normal(jax.random.PRNGKey(1), (dim,) + fine.grid_shape, f32)
    for d in range(dim):
        m1 = jnp.asarray(fine.free_mask_1d(), f32)
        shp = [1] * (dim + 1)
        shp[d + 1] = m1.shape[0]
        b = b * m1.reshape(shp)
    n_dofs = dim * fine.n_dofs
    op = model.levels[-1].op
    ta = measure_op(op.apply, b, iterations=(2, 6), repeats=3)
    print(json.dumps({
        "metric": "apply_dof_throughput_elasticity_3d_q3",
        "value": n_dofs / ta, "unit": "DoF/s", "apply_time_s": ta,
        "bench": f"elasticity_apply_q3_r{r}_{variant}", "variant": variant,
    }), flush=True)
    if not cycle:
        return
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                levels=model.levels)
    iters = (1, 3) if r >= 6 else (2, 6)
    t = measure_op(mg.apply, b, iterations=iters, repeats=3)
    print(json.dumps({
        "metric": "vcycle_dof_throughput_elasticity_3d_q3",
        "value": n_dofs / t, "unit": "DoF/s",
        "vs_baseline": n_dofs / t / 1.0e9,
        "vcycle_time_s": t, "n_dofs": n_dofs,
        "bench": f"elasticity_q3_r{r}_{variant}", "degree": 3, "dim": 3,
        "variant": variant,
    }), flush=True)


for rr, vv, cyc in ((6, "kron", False), (6, "sumfac", True)):
    print(f"--- bench elasticity r={rr} {vv} ---", flush=True)
    try:
        bench_elasticity(rr, vv, cycle=cyc)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": f"elasticity_r{rr}_{vv}",
                          "error": repr(e)[:300]}), flush=True)
print("batch10 done", flush=True)
