"""Round-4 TPU batch 3: bench the remaining BASELINE configs (VERDICT r3
item #6) — rows that have correctness tests but no DoF/s accounting:

(a) linear elasticity Q3 3D (BASELINE config 4; the round-3 kron fast
    path, commit 73766a3) at r=5 and r=6;
(b) the 2D Q7 p-ladder (the reference's second driver,
    /root/reference/source/polynomial_multigrid/program.cc:439-443):
    7-level ladder p=7..1 on one mesh, geometric-free;
(c) variable-coefficient Poisson (BASELINE config 4's scalar half):
    c(x) = 1 + 0.5*sin(pi x)sin(pi y)sin(pi z), sumfac path (the only
    variant supporting non-separable coefficients).

Each prints ONE JSON line (same schema as bench.py).  V-cycle levels are
built exactly as the production models do, so bench program == solver
program.  Run with PYTHONPATH=/root/repo:/root/.axon_site on the TPU.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid
from portable_multigrid_tpu.models.poisson import (
    GeometricMultigridPoisson,
    PolynomialMultigridPoisson,
)
from portable_multigrid_tpu.solvers.vcycle import VCycle
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32


def masked_b(space, shape, ncomp=None, seed=1):
    """Device-generated random rhs, Dirichlet-masked via separable 1D
    factors (no full-size host uploads through the slow tunnel)."""
    dim = space.dim
    full = shape if ncomp is None else (ncomp,) + shape
    b = jax.random.normal(jax.random.PRNGKey(seed), full, f32)
    off = 0 if ncomp is None else 1
    for d in range(dim):
        m1 = jnp.asarray(space.free_mask_1d(), f32)
        shp = [1] * len(full)
        shp[d + off] = m1.shape[0]
        b = b * m1.reshape(shp)
    return b


def emit(tag, metric, t_vcycle, n_dofs, extra=None):
    rec = {
        "metric": metric,
        "value": n_dofs / t_vcycle,
        "unit": "DoF/s",
        "vs_baseline": n_dofs / t_vcycle / 1.0e9,
        "vcycle_time_s": t_vcycle,
        "n_dofs": n_dofs,
        "bench": tag,
        "device": str(jax.devices()[0]),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)


def run(tag, fn):
    print(f"--- bench {tag} ---", flush=True)
    try:
        fn()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)


def bench_elasticity(r):
    model = ElasticityMultigrid(3, 3, r, dtype=f32, variant="kron")
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                levels=model.levels)
    b = masked_b(fine, fine.grid_shape, ncomp=3)
    iters = (1, 3) if r >= 6 else (2, 6)
    t = measure_op(mg.apply, b, iterations=iters, repeats=3)
    emit(f"elasticity_q3_r{r}", f"vcycle_dof_throughput_elasticity_3d_q3",
         t, 3 * fine.n_dofs, {"degree": 3, "dim": 3, "variant": "kron"})


def bench_pladder(r):
    model = PolynomialMultigridPoisson(2, 7, r, dtype=f32, variant="kron")
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=bool(getattr(model, "fine_trimmed", False)),
                levels=model.levels)
    b = masked_b(fine, fine.grid_shape)
    t = measure_op(mg.apply, b, iterations=(2, 6), repeats=3)
    emit(f"pladder_2d_q7_r{r}", "vcycle_dof_throughput_pladder_2d_q7",
         t, fine.n_dofs, {"degree": 7, "dim": 2, "variant": "kron",
                          "n_levels": 7})


def bench_varcoeff(r):
    coef = lambda x, y, z: (  # noqa: E731
        1.0 + 0.5 * np.sin(np.pi * x) * np.sin(np.pi * y) * np.sin(np.pi * z)
    )
    model = GeometricMultigridPoisson(3, 4, r, dtype=f32, variant="sumfac",
                                      coefficient=coef)
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=bool(getattr(model, "fine_trimmed", False)),
                levels=model.levels)
    b = masked_b(fine, fine.grid_shape)
    iters = (1, 3) if r >= 6 else (2, 6)
    t = measure_op(mg.apply, b, iterations=iters, repeats=3)
    emit(f"varcoeff_3d_q4_r{r}", "vcycle_dof_throughput_varcoeff_3d_q4",
         t, fine.n_dofs, {"degree": 4, "dim": 3, "variant": "sumfac"})


run("elasticity_q3_r5", lambda: bench_elasticity(5))
run("elasticity_q3_r6", lambda: bench_elasticity(6))
run("pladder_2d_q7_r9", lambda: bench_pladder(9))
run("varcoeff_3d_q4_r5", lambda: bench_varcoeff(5))
run("varcoeff_3d_q4_r6", lambda: bench_varcoeff(6))
print("batch3 done", flush=True)
