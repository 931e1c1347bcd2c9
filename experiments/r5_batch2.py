"""Round-5 TPU batch 2: cheb2lr ("pair + r_out") at production scale, and
median-of-5 banking for the headline rows (VERDICT r4 items 2 + 7).

Questions this batch answers on the real chip:
  * Does the recurrence-grade fused residual cost a CG iteration at the
    PRODUCTION configs (Q4 r=6 / r=7, f32, rtol 1e-5) as it does on the
    tiny CPU test grid (4 -> 5, tests/test_pallas_cheb2.py)?  If counts
    hold at scale, PMG_CHEB2R=1 becomes the TPU default; if not, it stays
    the documented opt-in.
  * What does the r=7 V-cycle measure with the residual1t pass fused away
    (the VERDICT r4 item-2 lever for the at-scale 1e9 crossing)?
  * Median-of-5 V-cycle times with spread for the Q2 r=7 and Q4 r=6
    headline rows (banking discipline, VERDICT r4 item 7).

One case per process (a Mosaic/worker crash must not poison the rest):
    python experiments/r5_batch2.py r6_count_off | r6_count_on |
        r7_count_off | r7_count_on | r6_time_on | r7_time_on |
        median_q4r6 | median_q2r7
Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU;
write output to a file (never through tail).
"""

import json
import os
import statistics
import sys


def setup(cheb2r: bool):
    os.environ["PMG_CHEB2R"] = "1" if cheb2r else "0"


def build(r: int):
    import jax.numpy as jnp

    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
    )

    return GeometricMultigridPoisson(3, 4, r, dtype=jnp.float32,
                                     variant="auto")


def count_case(r: int, cheb2r: bool):
    setup(cheb2r)
    model = build(r)
    _, st = model.solve(rtol=1e-5)
    print(json.dumps({
        "bench": f"solve_q4_r{r}_cheb2r{int(cheb2r)}",
        "iterations": st.iterations, "converged": st.converged,
        "residual_norm": st.residual_norm,
        "solution_l2_norm": st.solution_l2_norm,
    }), flush=True)


def time_case(r: int, cheb2r: bool, repeats: int = 5):
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.solvers.vcycle import VCycle
    from portable_multigrid_tpu.utils.profiling import measure_op

    setup(cheb2r)
    model = build(r)
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
    iters = (1, 3) if r >= 7 else (2, 6)
    # median-of-k SEPARATE slope measurements (not best-of-k): the banked
    # row must not depend on run selection (VERDICT r4 item 7)
    ts = [measure_op(mg.apply, b, iterations=iters, repeats=1)
          for _ in range(repeats)]
    med = statistics.median(ts)
    print(json.dumps({
        "metric": f"vcycle_dof_throughput_3d_q4_r{r}",
        "value": fine.n_dofs / med, "unit": "DoF/s",
        "vs_baseline": fine.n_dofs / med / 1.0e9,
        "vcycle_time_s_median": med,
        "vcycle_time_s_all": ts,
        "spread_pct": 100.0 * (max(ts) - min(ts)) / med,
        "n_dofs": fine.n_dofs, "cheb2r": cheb2r,
    }), flush=True)


def median_case(degree: int, r: int, repeats: int = 5):
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.solvers.vcycle import VCycle
    from portable_multigrid_tpu.utils.profiling import measure_op

    setup(False)
    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
    )

    model = GeometricMultigridPoisson(3, degree, r, dtype=jnp.float32,
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
    iters = (1, 3) if r >= 7 else (2, 6)
    ts = [measure_op(mg.apply, b, iterations=iters, repeats=1)
          for _ in range(repeats)]
    med = statistics.median(ts)
    print(json.dumps({
        "metric": f"vcycle_dof_throughput_3d_q{degree}_r{r}_median",
        "value": fine.n_dofs / med, "unit": "DoF/s",
        "vs_baseline": fine.n_dofs / med / 1.0e9,
        "vcycle_time_s_median": med,
        "vcycle_time_s_all": ts,
        "spread_pct": 100.0 * (max(ts) - min(ts)) / med,
        "n_dofs": fine.n_dofs,
    }), flush=True)


CASES = {
    "r6_count_off": lambda: count_case(6, False),
    "r6_count_on": lambda: count_case(6, True),
    "r7_count_off": lambda: count_case(7, False),
    "r7_count_on": lambda: count_case(7, True),
    "r6_time_on": lambda: time_case(6, True),
    "r7_time_on": lambda: time_case(7, True),
    "median_q4r6": lambda: median_case(4, 6),
    "median_q2r7": lambda: median_case(2, 7),
}

for key in sys.argv[1:] or ["r6_count_off"]:
    print(f"--- r5_batch2 {key} ---", flush=True)
    try:
        CASES[key]()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": key, "error": repr(e)[:300]}),
              flush=True)
print("r5_batch2 done", flush=True)
