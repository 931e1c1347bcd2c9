"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: DoF/s for one full V-cycle application on 3D Poisson (the
north-star in BASELINE.json is >= 1e9 DoF/s per chip).  Extra fields report
the Q4 operator-apply throughput and its fraction of roofline.

Run on the real TPU chip; falls back to whatever backend jax picks.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dim = 3
    degree = 4
    refinements = int(os.environ.get("PMG_BENCH_REFINEMENTS", "6"))  # 64^3 cells
    dtype = jnp.float32

    from portable_multigrid_tpu.fem.mesh import (
        HyperCubeMesh,
        geometric_coarsening_sequence,
    )
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.ops.laplace import make_laplace
    from portable_multigrid_tpu.ops.transfer import make_h_transfer
    from portable_multigrid_tpu.solvers.chebyshev import Chebyshev, make_chebyshev
    from portable_multigrid_tpu.solvers.vcycle import MGLevel, VCycle

    mesh = HyperCubeMesh(dim, refinements)
    spaces = [FESpace(m, degree) for m in geometric_coarsening_sequence(mesh)]
    fine = spaces[-1]
    n_dofs = fine.n_dofs

    # --- operator apply benchmark -----------------------------------------
    op = make_laplace(fine, dtype)
    apply_jit = jax.jit(op.apply)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(fine.grid_shape), dtype)
    apply_jit(u).block_until_ready()

    n_rep = 20
    t0 = time.perf_counter()
    v = u
    for _ in range(n_rep):
        v = apply_jit(v)
    v.block_until_ready()
    t_apply = (time.perf_counter() - t0) / n_rep
    apply_dofs_per_s = n_dofs / t_apply

    # --- V-cycle benchmark -------------------------------------------------
    levels = []
    for i, sp in enumerate(spaces):
        lop = make_laplace(sp, dtype)
        if i == 0:
            sm = make_chebyshev(
                lop, smoothing_range=1e-3, degree=None,
                eig_cg_n_iterations=min(sp.n_dofs, 64),
            )
        else:
            sm = make_chebyshev(lop, smoothing_range=15.0, degree=5,
                                eig_cg_n_iterations=10)
        tr = make_h_transfer(spaces[i - 1], sp, dtype) if i > 0 else None
        levels.append(MGLevel(op=lop, smoother=sm, transfer=tr))
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2, levels=tuple(levels))
    vcycle_jit = jax.jit(mg.apply)
    b = jnp.asarray(rng.standard_normal(fine.grid_shape), dtype)
    vcycle_jit(b).block_until_ready()

    n_rep_v = 5
    t0 = time.perf_counter()
    w = b
    for _ in range(n_rep_v):
        w = vcycle_jit(w)
    w.block_until_ready()
    t_vcycle = (time.perf_counter() - t0) / n_rep_v
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
        "dtype": "float32",
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
