"""Round-4 TPU batch 13: banded Pallas vector elasticity kernel
(ops/pallas_elasticity.py) vs the kron XLA path.

Per case (one per process — a Mosaic/worker crash must not poison the
rest, r4_batch7 pattern):
  * build ElasticityMultigrid variant="auto" (compile-probes the pallas
    kernel per level, kron fallback) and report which path each level got;
  * isolated fine-level apply throughput;
  * full production V-cycle throughput;
  * one real solve for the CG iteration count (parity signal vs the kron
    path's pinned count: 6 CG iterations at r=5, PERFORMANCE.md round-4 —
    golden_convergence.json has no elasticity rows).

Usage: python experiments/r4_batch13.py r5 | r6 | r6_16 | r5_kron ...
Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json
import sys

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid
from portable_multigrid_tpu.solvers.vcycle import VCycle
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32


def bench(r, variant, solve=True):
    model = ElasticityMultigrid(3, 3, r, dtype=f32, variant=variant)
    fine = model.spaces[-1]
    dim = fine.dim
    paths = [type(lv.op).__name__ for lv in model.levels]
    print(json.dumps({"bench": f"elasticity_q3_r{r}_{variant}",
                      "level_ops": paths}), flush=True)
    b = jax.random.normal(jax.random.PRNGKey(1), (dim,) + fine.grid_shape,
                          f32)
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
    if solve:
        _, stats = model.solve()
        print(json.dumps({
            "bench": f"elasticity_solve_q3_r{r}_{variant}",
            "iterations": stats.iterations,
            "converged": stats.converged,
            "residual_norm": stats.residual_norm,
        }), flush=True)


CASES = {
    "r5": (5, "auto", True),
    "r6": (6, "auto", False),
    "r5_kron": (5, "kron", True),
}

for key in sys.argv[1:] or ["r5"]:
    r, variant, solve = CASES[key]
    print(f"--- bench elasticity r={r} {variant} ---", flush=True)
    try:
        bench(r, variant, solve)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": f"elasticity_r{r}_{variant}",
                          "error": repr(e)[:300]}), flush=True)
print("batch13 done", flush=True)
