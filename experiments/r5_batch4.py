"""Round-5 TPU batch 4: on-chip production-path convergence pins, Q1..Q7
(VERDICT r4 item 4).

The known silent failure mode of smoother-grade arithmetic is iteration
doubling (round-2 bf16-residual lesson) — a timing row never catches it,
and Q5/Q6/Q7 run the novel mxu3-as-exact rescue + zpad paths on chip with
no recorded end-to-end count.  For each degree this records, at the SAME
f32 / rtol=1e-5 config:
  * variant=auto  (the production kernel ladder) CG count + L2 norm;
  * variant=kron  (exact XLA control)            CG count + L2 norm.
Pass = counts EQUAL and L2 agree to f32 grade; where the golden table has
the (p, r) config, the L2 norm is also compared against the f64 oracle.

One (degree, r) per process: python experiments/r5_batch4.py q5_r3 q5_r5 ...
Run with PYTHONPATH=/root/repo:/root/.axon_site; output to a file.
"""

import json
import os
import sys


def run(p: int, r: int):
    import jax.numpy as jnp

    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
    )

    row = {"bench": f"onchip_pin_q{p}_r{r}"}
    for variant in ("auto", "kron"):
        _, st = GeometricMultigridPoisson(
            3, p, r, dtype=jnp.float32, variant=variant
        ).solve(rtol=1e-5)
        row[variant] = {
            "iterations": st.iterations, "converged": st.converged,
            "l2_norm": st.solution_l2_norm,
            "residual_norm": st.residual_norm,
        }
    golden_path = os.path.join(os.path.dirname(__file__), "..", "tests",
                               "golden_convergence.json")
    with open(golden_path) as f:
        geo = json.load(f)["geometric_3d"]
    want = next((e for e in geo
                 if e["degree"] == p and e["refinements"] == r), None)
    if want is not None:
        row["golden_l2"] = want["l2_norm"]
        row["golden_iterations"] = want["iterations"]
        row["l2_vs_golden_rel"] = abs(
            row["auto"]["l2_norm"] - want["l2_norm"]
        ) / abs(want["l2_norm"])
    row["counts_equal"] = row["auto"]["iterations"] == row["kron"]["iterations"]
    print(json.dumps(row), flush=True)


CASES = {}
for p in range(1, 8):
    for r in (3, 5):
        CASES[f"q{p}_r{r}"] = (lambda p=p, r=r: run(p, r))

for key in sys.argv[1:] or ["q4_r3"]:
    print(f"--- r5_batch4 {key} ---", flush=True)
    try:
        CASES[key]()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": key, "error": repr(e)[:300]}), flush=True)
print("r5_batch4 done", flush=True)
