"""Round-5 TPU batch 6: at-scale medians + 2D pallas first-light.

Cases (one per process — a worker crash must not poison the rest):
  * median_q4r7 — the at-scale headline (Q4 r=7, 135M DoF) as a
    median-of-5 WITHOUT cheb2r (the fused pre-restriction residual costs
    one CG iteration at production rtol — r5_batch2 counts — so the
    honest at-scale row is the plain pipeline);
  * apply2d_q7r9 — isolated 2D fused-kernel apply at the reference
    driver-2 fine level (Q7, n=512: 3584 lanes), vs the bkron XLA apply;
  * probe2d — compile-probe the 2D kernel ladder across the full r=9
    p-ladder degrees (maps the 2D Mosaic crash envelope in one process
    per degree is NOT needed: probes are AOT-only, no execution).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r5_batch6.py <case>
Write output to a file (never through tail).
"""

import json
import statistics
import sys


def median_q4r7(repeats: int = 5):
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
    )
    from portable_multigrid_tpu.solvers.vcycle import VCycle
    from portable_multigrid_tpu.utils.profiling import measure_op

    model = GeometricMultigridPoisson(3, 4, 7, dtype=jnp.float32,
                                      variant="auto")
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=model.fine_trimmed, levels=model.levels)
    b = jax.random.normal(jax.random.PRNGKey(1), fine.grid_shape,
                          jnp.float32)
    m1 = jnp.asarray(fine.free_mask_1d(), jnp.float32)
    for d in range(3):
        shp = [1, 1, 1]
        shp[d] = m1.shape[0]
        b = b * m1.reshape(shp)
    ts = [measure_op(mg.apply, b, iterations=(1, 3), repeats=1)
          for _ in range(repeats)]
    med = statistics.median(ts)
    print(json.dumps({
        "metric": "vcycle_dof_throughput_3d_q4_r7_median",
        "value": fine.n_dofs / med, "unit": "DoF/s",
        "vs_baseline": fine.n_dofs / med / 1.0e9,
        "vcycle_time_s_median": med, "vcycle_time_s_all": ts,
        "spread_pct": 100.0 * (max(ts) - min(ts)) / med,
        "n_dofs": fine.n_dofs,
    }), flush=True)


def apply2d_q7r9():
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.ops.laplace import make_laplace
    from portable_multigrid_tpu.ops.pallas_laplace2d import (
        make_laplace2d_candidate,
    )
    from portable_multigrid_tpu.utils.profiling import measure_op

    sp = FESpace(HyperCubeMesh(2, 9), 7)
    row = {"bench": "apply2d_q7r9", "n_dofs": sp.n_dofs}
    op = make_laplace2d_candidate(sp, jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(0), sp.grid_shape, jnp.float32)
    if op is not None:
        row["pallas_bx"] = op.bx
        t = measure_op(op.apply, u, repeats=2)
        row["pallas_ms"] = round(t * 1e3, 3)
        row["pallas_dof_s"] = sp.n_dofs / t
    else:
        row["pallas_ms"] = None
    bk = make_laplace(sp, jnp.float32, variant="bkron", precision="high")
    t = measure_op(bk.apply, u, repeats=2)
    row["bkron_ms"] = round(t * 1e3, 3)
    print(json.dumps(row), flush=True)


def probe2d():
    import jax.numpy as jnp

    from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.ops.pallas_laplace2d import (
        laplace2d_compile_ok,
        make_pallas_laplace2d,
        pallas2d_eligible,
    )

    for p in range(1, 8):
        sp = FESpace(HyperCubeMesh(2, 9), p)
        row = {"bench": "probe2d", "p": p}
        for bx in (32, 16, 8):
            if not pallas2d_eligible(sp, bx):
                row[f"bx{bx}"] = "ineligible"
                continue
            op = make_pallas_laplace2d(sp, jnp.float32, bx=bx)
            row[f"bx{bx}"] = bool(laplace2d_compile_ok(op))
        print(json.dumps(row), flush=True)


CASES = {
    "median_q4r7": median_q4r7,
    "apply2d_q7r9": apply2d_q7r9,
    "probe2d": probe2d,
}

for key in sys.argv[1:] or ["probe2d"]:
    print(f"--- r5_batch6 {key} ---", flush=True)
    try:
        CASES[key]()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": key, "error": repr(e)[:300]}), flush=True)
print("r5_batch6 done", flush=True)
