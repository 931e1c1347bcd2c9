"""Reference-sweep benchmark: Q1..Q7 geometric 3D + 2D Q7 p-ladder + Q3
elasticity (VERDICT r2 #8; reference sweep:
source/geometric_multigrid/program.cc:434-459).

Per degree, the refinement is chosen so the fused pallas path applies where
eligibility (n*p % 128 == 0) allows; other degrees run the kron/XLA path —
the row notes which.  Output: one JSON line per row (collected into the
PERFORMANCE.md table).
"""

import json
import os

import bench


def run(degree, refinements, note, dim=3):
    os.environ["PMG_BENCH_DIM"] = str(dim)
    os.environ["PMG_BENCH_DEGREE"] = str(degree)
    os.environ["PMG_BENCH_REFINEMENTS"] = str(refinements)
    print(f"--- sweep q{degree} r{refinements} ({note}) ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"sweep": f"q{degree}_r{refinements}",
                          "error": repr(e)[:400]}), flush=True)


# (degree, refinements, fast-path note): eligibility n*p % 128 == 0
run(1, 7, "pallas (128 lanes)")
run(2, 7, "pallas (256 lanes)")
run(3, 7, "pallas (384 lanes)")
run(4, 6, "pallas (256 lanes) — headline")
run(5, 6, "kron (320 lanes ineligible)")
run(6, 6, "pallas (384 lanes)")
run(7, 5, "kron (224 lanes ineligible)")

# 2D Q7 polynomial ladder (reference polynomial_multigrid driver config)
import time

import jax
import jax.numpy as jnp
import numpy as np

from portable_multigrid_tpu.models.poisson import PolynomialMultigridPoisson
from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid


def time_solve(mk, tag, rtol=1e-5):
    try:
        prob = mk()
        _, st0 = prob.solve(rtol=rtol)  # warm/compile
        t0 = time.perf_counter()
        _, st = prob.solve(rtol=rtol)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "sweep": tag, "n_dofs": st.n_dofs, "iterations": st.iterations,
            "solve_s": dt, "dofs_per_s": st.n_dofs / dt,
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"sweep": tag, "error": repr(e)[:400]}), flush=True)


time_solve(lambda: PolynomialMultigridPoisson(
    2, 7, 9, dtype=jnp.float32, variant="kron"), "2d_q7_pladder_r9")
time_solve(lambda: ElasticityMultigrid(3, 3, 4, dtype=jnp.float32),
           "3d_q3_elasticity_r4")
