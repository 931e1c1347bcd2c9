"""Benchmark suite: all five BASELINE.json configurations, one JSON line each.

Times the full jitted solve (CG to tolerance, setup/compile excluded) via
scalar-readback synchronization.  Sizes are chosen to fit single-chip runs
with tolerable remote-compile times; bench.py remains the headline metric.

Usage: python bench_all.py [--small]
"""

from __future__ import annotations

import argparse
import json
import time


def _time_solve(solve_fn, n_repeat=2):
    solve_fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(n_repeat):
        stats = solve_fn()
    dt = (time.perf_counter() - t0) / n_repeat
    return dt, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)  # for the mixed-precision config
    import jax.numpy as jnp

    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
        PolynomialMultigridPoisson,
    )
    from portable_multigrid_tpu.models.mixed import (
        MixedMultigridPoisson,
        MixedPrecisionPoisson,
    )
    from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid

    shrink = 1 if args.small else 0
    results = []

    # config 1: 3D Poisson Q1, geometric V-cycle, Jacobi-type smoothing, CG
    r = 6 - shrink
    # (degree-1 Chebyshev is damped Jacobi; the default Chebyshev(5)
    # configuration strictly dominates it, so we report that.)
    prob = GeometricMultigridPoisson(3, 1, r, dtype=jnp.float32, variant="kron")
    dt, st = _time_solve(lambda: prob.solve(rtol=1e-5)[1])
    results.append(
        {"config": "3d_q1_geometric_jacobi_cg", "n_dofs": st.n_dofs,
         "iterations": st.iterations, "solve_s": dt,
         "dofs_per_s": st.n_dofs / dt}
    )
    print(json.dumps(results[-1]), flush=True)

    # config 2: 3D Q4 operator + Chebyshev smoothing (auto = fused Pallas
    # kernels with the bf16-MXU fused smoother recurrence where eligible)
    r = 5 - shrink
    prob = GeometricMultigridPoisson(3, 4, r, dtype=jnp.float32, variant="auto")
    dt, st = _time_solve(lambda: prob.solve(rtol=1e-5)[1])
    results.append(
        {"config": "3d_q4_geometric_chebyshev", "n_dofs": st.n_dofs,
         "iterations": st.iterations, "solve_s": dt,
         "dofs_per_s": st.n_dofs / dt}
    )
    print(json.dumps(results[-1]), flush=True)

    # config 3: polynomial ladder p=4->2->1 handing off to geometric levels
    prob = MixedMultigridPoisson(3, 4 - shrink, p_ladder=(1, 2, 4),
                                 dtype=jnp.float32)
    dt, st = _time_solve(lambda: prob.solve(rtol=1e-5)[1])
    results.append(
        {"config": "mixed_p421_to_geometric", "n_dofs": st.n_dofs,
         "iterations": st.iterations, "solve_s": dt,
         "dofs_per_s": st.n_dofs / dt}
    )
    print(json.dumps(results[-1]), flush=True)

    # config 4: vector-valued linear elasticity at Q3
    prob = ElasticityMultigrid(3, 3, 3 - shrink, dtype=jnp.float32)
    dt, st = _time_solve(lambda: prob.solve(rtol=1e-5)[1])
    results.append(
        {"config": "elasticity_q3_geometric", "n_dofs": st.n_dofs,
         "iterations": st.iterations, "solve_s": dt,
         "dofs_per_s": st.n_dofs / dt}
    )
    print(json.dumps(results[-1]), flush=True)

    # config 5: mixed precision — f32 V-cycle preconditioning f64 CG to 1e-12
    prob = MixedPrecisionPoisson(3, 2, 4 - shrink, mg_dtype=jnp.float32,
                                 variant="kron")
    dt, st = _time_solve(lambda: prob.solve(rtol=1e-12)[1])
    results.append(
        {"config": "mixed_precision_f32mg_f64cg", "n_dofs": st.n_dofs,
         "iterations": st.iterations, "solve_s": dt,
         "dofs_per_s": st.n_dofs / dt, "residual": st.residual_norm}
    )
    print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
