"""Round-4 TPU batch 9: elasticity dense-element-matrix variant.

The batch-3 elasticity rows ran the kron path (assembled global 1D
matrices): 21 Kronecker chains x dim tensordots, each O(N^4) FLOPs
because the assembled 1D matrices are stored dense — 17.4 ms (r=5) /
211 ms (r=6) at Q3.  The new variant="dense" applies the constant
[dim*(p+1)^dim]^2 element matrix as ONE MXU matmul over all elements
(ops/elasticity.py:apply_dense): O(E*(dim*ndof)^2) on the systolic
array, ~155 GFLOP per apply at Q3 r=6 vs kron's ~2.8 TFLOP.

Cases: Q3 r=5 and r=6, dense vs (control) kron at r=5.
Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid
from portable_multigrid_tpu.solvers.vcycle import VCycle
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32


def bench_elasticity(r, variant):
    model = ElasticityMultigrid(3, 3, r, dtype=f32, variant=variant)
    fine = model.spaces[-1]
    dim = fine.dim
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                levels=model.levels)
    b = jax.random.normal(jax.random.PRNGKey(1), (dim,) + fine.grid_shape, f32)
    for d in range(dim):
        m1 = jnp.asarray(fine.free_mask_1d(), f32)
        shp = [1] * (dim + 1)
        shp[d + 1] = m1.shape[0]
        b = b * m1.reshape(shp)
    n_dofs = dim * fine.n_dofs
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
    # isolated fine-level apply
    op = model.levels[-1].op
    ta = measure_op(op.apply, b, iterations=(4, 12), repeats=3)
    print(json.dumps({
        "metric": "apply_dof_throughput_elasticity_3d_q3",
        "value": n_dofs / ta, "unit": "DoF/s",
        "apply_time_s": ta,
        "bench": f"elasticity_apply_q3_r{r}_{variant}",
        "variant": variant,
    }), flush=True)


for rr, vv in ((5, "dense"), (5, "kron"), (6, "dense")):
    print(f"--- bench elasticity r={rr} {vv} ---", flush=True)
    try:
        bench_elasticity(rr, vv)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": f"elasticity_r{rr}_{vv}",
                          "error": repr(e)[:300]}), flush=True)
print("batch9 done", flush=True)
