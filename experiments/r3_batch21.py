"""Round-3 TPU batch 21: post-cheb2 diagnostics and the re-benched degree
rows the cheb2 pair kernels should lift.

(a) Q2 r=7 and Q3 r=7 production benches (the pre-cheb2 rows were 8.7e8
    and 5.2e8; Q2 is the closest row to the 1e9 north star);
(b) coarse-recursion share at Q4: a full r=5-rooted V-cycle IS the r=6
    cycle's recursion below the fine level (same levels, same V(2,2)
    smooths), so bench r=5 == the coarse share of the r=6 budget;
(c) marginal smoothing cost with cheb2: V-cycle at PMG_BENCH_SMOOTH_STEPS
    2 vs 3 — the slope is the per-extra-(pre+post)-smooth cost summed over
    levels (fine dominates), the same technique as r3_batch17;
(d) end-to-end production CG solve at r=6 Q4 f32 (solve DoF/s and the
    iteration-count canary with cheb2 in the composition).

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json
import os
import time

import jax
import jax.numpy as jnp


def probe(tag, fn):
    try:
        out = fn()
        rec = {"case": tag, "ok": True}
        if isinstance(out, dict):
            rec.update(out)
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:300]}), flush=True)


import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    os.environ["PMG_BENCH_DEGREE"] = env.pop("degree", "4")
    os.environ.setdefault("PMG_BENCH_VARIANT", "auto")
    for kk, v in env.items():
        os.environ[kk] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)
    for kk in env:
        os.environ.pop(kk, None)


# (a) degree rows closest to / below the north star
run_bench("q2_r7_cheb2", degree="2", r="7")
run_bench("q3_r7_cheb2", degree="3", r="7")

# (b) coarse-recursion share of the r=6 Q4 cycle
run_bench("q4_r5_coarse_share", degree="4", r="5")

# (c) marginal smoothing cost (steps 3 vs the production 2; slope/2 =
# one extra pre+post pair across the hierarchy)
run_bench("q4_r6_steps3", degree="4", r="6", PMG_BENCH_SMOOTH_STEPS="3")


# (d) end-to-end production solve, r=6 Q4 f32
def solve_r6():
    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
    )

    prob = GeometricMultigridPoisson(3, 4, 6, dtype=jnp.float32,
                                     variant="auto")
    _, st0 = prob.solve(rtol=1e-5)  # warm/compile
    t0 = time.perf_counter()
    _, st = prob.solve(rtol=1e-5)
    dt = time.perf_counter() - t0
    return {
        "n_dofs": st.n_dofs, "iterations": st.iterations,
        "solve_s": dt, "dofs_per_s": st.n_dofs / dt,
    }


probe("solve_r6_q4_production", solve_r6)
