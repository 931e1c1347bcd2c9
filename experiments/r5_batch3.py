"""Round-5 TPU batch 3: the 2D fast path (block-banded Kronecker, VERDICT
r4 item 3).

The 2D drivers ran pure XLA sumfac/kron: Q7 r=9 p-ladder at 2.79e7 DoF/s
(461 ms / 12.9M DoF, PERFORMANCE.md:134) because dense-kron 1D matmuls are
O(N^2) per contraction at N = 3585 (and their closure constants 413 the
remote compile).  The bkron variant packs the SAME assembled 1D matrices
block-tridiagonally ([nb, 3, 128, 128], 5.7 MB at r=9) and contracts with
3 batched MXU matmuls — O(384 N).

Cases (one per process — a worker crash must not poison the rest):
  * crossover — isolated 2D apply, kron vs bkron, N in {513..3585}
    (tunes PMG_BKRON_MIN_N);
  * pladder9 / pladder8 — the reference driver-2 config (2D Q7 p-ladder,
    V(2,2)): full V-cycle median-of-5 with variant auto;
  * count9 — one real solve: CG count + L2 norm (parity signal vs the
    sumfac row's pinned count).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r5_batch3.py <case>
Write output to a file (never through tail).
"""

import json
import statistics
import sys


def _model(r: int):
    import jax.numpy as jnp

    from portable_multigrid_tpu.models.poisson import (
        PolynomialMultigridPoisson,
    )

    # reference config: Q7, levels 7->1, V(2,2)
    # (/root/reference/source/polynomial_multigrid/program.cc:439-443)
    return PolynomialMultigridPoisson(2, 7, r, 7, dtype=jnp.float32,
                                      variant="auto")


def crossover():
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.ops.laplace import make_laplace
    from portable_multigrid_tpu.utils.profiling import measure_op

    for r, p in [(9, 1), (9, 2), (9, 4), (8, 7), (9, 7)]:
        sp = FESpace(HyperCubeMesh(2, r), p)
        N = sp.points_per_axis
        row = {"bench": "apply2d", "r": r, "p": p, "N": N}
        for variant in ("kron", "bkron", "sumfac"):
            if variant == "kron" and N > 2100:
                row["kron_ms"] = None  # 413s the remote compile (dense 1D)
                continue
            try:
                op = make_laplace(sp, jnp.float32, variant=variant,
                                  precision="high")
                u = jax.random.normal(jax.random.PRNGKey(0), op.grid_shape,
                                      jnp.float32)
                t = measure_op(op.apply, u, repeats=2)
                row[f"{variant}_ms"] = round(t * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                row[f"{variant}_ms"] = f"ERR {type(e).__name__}"
        print(json.dumps(row), flush=True)


def pladder(r: int, repeats: int = 5):
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.solvers.vcycle import VCycle
    from portable_multigrid_tpu.utils.profiling import measure_op

    model = _model(r)
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=model.fine_trimmed, levels=model.levels)
    b = jax.random.normal(jax.random.PRNGKey(1), fine.grid_shape,
                          jnp.float32)
    m1 = jnp.asarray(fine.free_mask_1d(), jnp.float32)
    b = b * m1.reshape(-1, 1) * m1.reshape(1, -1)
    ts = [measure_op(mg.apply, b, iterations=(2, 6), repeats=1)
          for _ in range(repeats)]
    med = statistics.median(ts)
    print(json.dumps({
        "metric": f"vcycle_dof_throughput_2d_q7_r{r}_median",
        "value": fine.n_dofs / med, "unit": "DoF/s",
        "vcycle_time_s_median": med, "vcycle_time_s_all": ts,
        "spread_pct": 100.0 * (max(ts) - min(ts)) / med,
        "n_dofs": fine.n_dofs,
        "variants": [type(l.op).__name__ + ":" + getattr(l.op, "variant", "")
                     for l in model.levels],
    }), flush=True)


def count(r: int):
    model = _model(r)
    _, st = model.solve(rtol=1e-5)
    print(json.dumps({
        "bench": f"solve_2d_q7_r{r}_auto",
        "iterations": st.iterations, "converged": st.converged,
        "residual_norm": st.residual_norm,
        "solution_l2_norm": st.solution_l2_norm,
    }), flush=True)


CASES = {
    "crossover": crossover,
    "pladder9": lambda: pladder(9),
    "pladder8": lambda: pladder(8),
    "count9": lambda: count(9),
    "count8": lambda: count(8),
}

for key in sys.argv[1:] or ["crossover"]:
    print(f"--- r5_batch3 {key} ---", flush=True)
    try:
        CASES[key]()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": key, "error": repr(e)[:300]}), flush=True)
print("r5_batch3 done", flush=True)
