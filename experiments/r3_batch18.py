"""Round-3 TPU batch 18: reference-sweep rows unlocked or left unfinished by
earlier batches — Q5/Q7 V-cycle benches on the newly lane-padded pallas path
(batch-16: both cores compile with zpad 64/32), the 2D Q7 p-ladder r=8 row
and 3D Q3 elasticity row (batch 15 died after the r=7 p-ladder row), and the
amortized Q1 r=8 row rerun (the batch-14 line had a negative timing slope —
grid-sized rhs closures were deduplicated by the relay; masked on-device rhs
avoids it).
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


# Q5 r=6: 33.1M DoF, was kron 2.3e8 — now pallas (zpad 64, banded 8x8 /
# mxu 16x8).  Q7 r=5: 11.4M DoF, was kron 3.1e8 — now pallas (zpad 32).
run_bench("q5_r6_zpad", degree="5")
run_bench("q7_r5_zpad", degree="7", r="5")


def time_solve(mk, tag, rtol=1e-5):
    prob = mk()
    _, st0 = prob.solve(rtol=rtol)  # warm/compile
    t0 = time.perf_counter()
    _, st = prob.solve(rtol=rtol)
    dt = time.perf_counter() - t0
    return {
        "sweep": tag, "n_dofs": st.n_dofs, "iterations": st.iterations,
        "solve_s": dt, "dofs_per_s": st.n_dofs / dt,
    }


def pladder_r8():
    from portable_multigrid_tpu.models.poisson import PolynomialMultigridPoisson

    return time_solve(
        lambda: PolynomialMultigridPoisson(2, 7, 8, dtype=jnp.float32,
                                           variant="kron"),
        "2d_q7_pladder_r8")


def elasticity_r4():
    from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid

    return time_solve(
        lambda: ElasticityMultigrid(3, 3, 4, dtype=jnp.float32),
        "3d_q3_elasticity_r4")


probe("2d_q7_pladder_r8", pladder_r8)
probe("3d_q3_elasticity_r4", elasticity_r4)

# Q1 r=8 amortized (16.8M DoF; the Q1 r=7 row is fixed-cost bound at 2.1M)
run_bench("q1_r8_amortized", degree="1", r="8")
