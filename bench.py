"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: DoF/s for one full V-cycle application on 3D Poisson Q4 (the
north-star in BASELINE.json is >= 1e9 DoF/s per chip).  Extra fields report
the operator-apply throughput.

Timing methodology: the kernel under test is iterated inside a single jitted
lax.fori_loop and synchronized through a scalar readback; the per-iteration
time is the slope between two iteration counts.  This removes dispatch/RPC
overhead and is robust on backends where block_until_ready is unreliable
(e.g. tunneled TPU attachments).
"""

from __future__ import annotations

import json
import os
import time


def _measure(f, x0, ns=(2, 8)):
    import jax
    import jax.numpy as jnp

    ts = {}
    for n in ns:

        @jax.jit
        def loop(v, n=n):
            y = jax.lax.fori_loop(0, n, lambda i, u: f(u), v)
            return jnp.sum(y.ravel()[:1])

        float(loop(x0))  # compile + warm
        t0 = time.perf_counter()
        float(loop(x0))
        ts[n] = time.perf_counter() - t0
    return (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    dim = 3
    degree = 4
    refinements = int(os.environ.get("PMG_BENCH_REFINEMENTS", "6"))  # 64^3 cells
    variant = os.environ.get("PMG_BENCH_VARIANT", "auto")
    # 'high' (3-pass bf16, ~f32 accuracy) for the V-cycle preconditioner is
    # numerically safe (verified in tests/test_mixed.py: even a full-f32
    # V-cycle preserves the f64 CG convergence history); the reported apply
    # number uses the same setting.
    precision = os.environ.get("PMG_BENCH_PRECISION", "high")
    dtype = jnp.float32

    from portable_multigrid_tpu.fem.mesh import (
        HyperCubeMesh,
        geometric_coarsening_sequence,
    )
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.ops.laplace import make_laplace
    from portable_multigrid_tpu.ops.pallas_laplace import make_laplace_auto
    from portable_multigrid_tpu.ops.transfer import make_h_transfer
    from portable_multigrid_tpu.solvers.chebyshev import Chebyshev
    from portable_multigrid_tpu.solvers.vcycle import MGLevel, VCycle

    mesh = HyperCubeMesh(dim, refinements)
    spaces = [FESpace(m, degree) for m in geometric_coarsening_sequence(mesh)]
    fine = spaces[-1]
    n_dofs = fine.n_dofs

    def build_op(sp):
        if variant == "auto":
            return make_laplace_auto(sp, dtype, precision=precision)
        return make_laplace(sp, dtype, variant=variant, precision=precision)

    # --- operator apply benchmark -----------------------------------------
    op = build_op(fine)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fine.grid_shape), dtype)
    t_apply = _measure(op.apply, u)
    apply_dofs_per_s = n_dofs / t_apply

    # --- V-cycle benchmark -------------------------------------------------
    # Fixed Chebyshev bounds instead of the setup-time eigenvalue CG: the
    # bounds only affect convergence quality, not per-cycle cost, and
    # skipping the per-level eig solves keeps the bench fast and robust.
    levels = []
    for i, sp in enumerate(spaces):
        lop = build_op(sp)
        sm = Chebyshev(
            degree=24 if i == 0 else 5,
            op=lop,
            inv_diag=lop.inv_diag,
            theta=jnp.asarray(1.1, dtype),
            delta=jnp.asarray(0.95, dtype),
        )
        tr = make_h_transfer(spaces[i - 1], sp, dtype) if i > 0 else None
        levels.append(MGLevel(op=lop, smoother=sm, transfer=tr))
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2, levels=tuple(levels))
    b = jnp.asarray(rng.standard_normal(fine.grid_shape), dtype)
    t_vcycle = _measure(mg.apply, b, ns=(1, 3))
    vcycle_dofs_per_s = n_dofs / t_vcycle

    result = {
        "metric": "vcycle_dof_throughput_3d_q4",
        "value": vcycle_dofs_per_s,
        "unit": "DoF/s",
        "vs_baseline": vcycle_dofs_per_s / 1.0e9,  # north-star: 1e9 DoF/s/chip
        "apply_dofs_per_s": apply_dofs_per_s,
        "apply_time_s": t_apply,
        "vcycle_time_s": t_vcycle,
        "n_dofs": n_dofs,
        "degree": degree,
        "dim": dim,
        "variant": variant,
        "precision": precision,
        "dtype": "float32",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
