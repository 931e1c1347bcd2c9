"""Round-5 TPU batch 5: the variable-coefficient block-banded path
(VERDICT r4 item 6).

qdense banked 3.34e7 DoF/s at Q4 r=6 — bound by the element gather/scatter
and the [E, nq^dim] coefficient stream.  The new qbanded variant hoists
the q-point pipeline to GLOBAL per-axis block-banded matrices
(ops/bblock.py): no element layout at all, coefficient stays in grid
layout, every stage a batched MXU matmul.  Target >= 1e8 DoF/s at Q4 r=6
(3x qdense).

Cases (one per process):
  * q4_r5 / q4_r6 — V-cycle median-of-5, PMG_VARCOEFF_VARIANT=qbanded
    (same coefficient as the banked qdense rows, experiments/r4_batch8.py);
  * count_r5 — full solve iteration-count parity qbanded vs qdense;
  * apply_r6 — isolated fine-operator apply, qbanded vs qdense vs sumfac.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r5_batch5.py <case>
"""

import json
import os
import statistics
import sys


def _coef():
    import numpy as np

    return lambda x, y, z: (
        1.0 + 0.5 * np.sin(np.pi * x) * np.sin(np.pi * y) * np.sin(np.pi * z)
    )


def _model(r: int, variant: str):
    import jax.numpy as jnp

    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
    )

    os.environ["PMG_VARCOEFF_VARIANT"] = variant
    return GeometricMultigridPoisson(3, 4, r, dtype=jnp.float32,
                                     coefficient=_coef())


def vcycle(r: int, variant: str = "qbanded", repeats: int = 5):
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.solvers.vcycle import VCycle
    from portable_multigrid_tpu.utils.profiling import measure_op

    model = _model(r, variant)
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=bool(getattr(model, "fine_trimmed", False)),
                levels=model.levels)
    b = jax.random.normal(jax.random.PRNGKey(1), fine.grid_shape,
                          jnp.float32)
    m1 = jnp.asarray(fine.free_mask_1d(), jnp.float32)
    for d in range(3):
        shp = [1, 1, 1]
        shp[d] = m1.shape[0]
        b = b * m1.reshape(shp)
    iters = (1, 3) if r >= 6 else (2, 6)
    ts = [measure_op(mg.apply, b, iterations=iters, repeats=1)
          for _ in range(repeats)]
    med = statistics.median(ts)
    print(json.dumps({
        "metric": "vcycle_dof_throughput_varcoeff_3d_q4",
        "value": fine.n_dofs / med, "unit": "DoF/s",
        "vs_baseline": fine.n_dofs / med / 1.0e9,
        "vcycle_time_s_median": med, "vcycle_time_s_all": ts,
        "spread_pct": 100.0 * (max(ts) - min(ts)) / med,
        "n_dofs": fine.n_dofs, "bench": f"varcoeff_{variant}_r{r}",
        "variant": variant,
    }), flush=True)


def count(r: int):
    rows = {}
    for variant in ("qbanded", "qdense"):
        model = _model(r, variant)
        _, st = model.solve(rtol=1e-5)
        rows[variant] = {"iterations": st.iterations,
                         "converged": st.converged,
                         "l2_norm": st.solution_l2_norm}
    rows["bench"] = f"varcoeff_count_r{r}"
    rows["counts_equal"] = (
        rows["qbanded"]["iterations"] == rows["qdense"]["iterations"]
    )
    print(json.dumps(rows), flush=True)


def apply_bench(r: int):
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.ops.laplace import make_laplace
    from portable_multigrid_tpu.utils.profiling import measure_op

    sp = FESpace(HyperCubeMesh(3, r), 4)
    row = {"bench": f"varcoeff_apply_r{r}", "n_dofs": sp.n_dofs}
    for variant in ("qbanded", "qdense", "sumfac"):
        op = make_laplace(sp, jnp.float32, variant=variant,
                          coefficient=_coef(), precision="high")
        u = jax.random.normal(jax.random.PRNGKey(0), op.grid_shape,
                              jnp.float32)
        t = measure_op(op.apply, u, repeats=2)
        row[f"{variant}_ms"] = round(t * 1e3, 3)
        row[f"{variant}_dofs_per_s"] = sp.n_dofs / t
    print(json.dumps(row), flush=True)


CASES = {
    "q4_r5": lambda: vcycle(5),
    "q4_r6": lambda: vcycle(6),
    "count_r5": lambda: count(5),
    "apply_r6": lambda: apply_bench(6),
}

for key in sys.argv[1:] or ["apply_r6"]:
    print(f"--- r5_batch5 {key} ---", flush=True)
    try:
        CASES[key]()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": key, "error": repr(e)[:300]}), flush=True)
print("r5_batch5 done", flush=True)
