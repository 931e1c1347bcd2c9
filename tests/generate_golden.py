"""Generate golden convergence data (CPU, float64).

Runs the reference driver configurations (geometric 3D sweep + polynomial 2D
ladder, scaled to CPU-tractable sizes) and records CG iteration counts and
solution L2 norms — the two correctness oracles the reference prints
(reference: source/geometric_multigrid/program.cc:354-355,395).

Usage: python tests/generate_golden.py           # compute MISSING rows only
       python tests/generate_golden.py --regen   # recompute everything

The default is merge mode: existing rows are bit-stable oracles
(tests/test_golden_convergence.py pins them exactly), so extending the
table must never touch them.  --regen is for deliberate semantic changes
only — explain why in the commit.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

OUT = os.path.join(os.path.dirname(__file__), "golden_convergence.json")

# the reference sweeps p = 1..7 (source/geometric_multigrid/program.cc:
# 434-459); r capped per degree to stay CPU-f64-tractable
GEO_CONFIGS = [
    (d, r) for d in (1, 2, 3, 4, 5, 6, 7) for r in (1, 2, 3)
]
POLY_CONFIGS = [(7, 7, 1), (7, 7, 2), (4, 4, 3)]


def main():
    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
        PolynomialMultigridPoisson,
    )

    golden = {"geometric_3d": [], "polynomial_2d": []}
    if "--regen" not in sys.argv and os.path.exists(OUT):
        with open(OUT) as f:
            golden = json.load(f)

    have_geo = {(e["degree"], e["refinements"]) for e in golden["geometric_3d"]}
    for degree, refinements in GEO_CONFIGS:
        if (degree, refinements) in have_geo:
            continue
        _, st = GeometricMultigridPoisson(3, degree, refinements).solve()
        golden["geometric_3d"].append(
            {
                "degree": degree,
                "refinements": refinements,
                "n_dofs": st.n_dofs,
                "iterations": st.iterations,
                "l2_norm": st.solution_l2_norm,
                "converged": st.converged,
            }
        )
        print(golden["geometric_3d"][-1], flush=True)

    have_poly = {
        (e["degree"], e["levels"], e["refinements"])
        for e in golden["polynomial_2d"]
    }
    for degree, levels, refinements in POLY_CONFIGS:
        if (degree, levels, refinements) in have_poly:
            continue
        _, st = PolynomialMultigridPoisson(2, degree, refinements, levels).solve()
        golden["polynomial_2d"].append(
            {
                "degree": degree,
                "levels": levels,
                "refinements": refinements,
                "n_dofs": st.n_dofs,
                "iterations": st.iterations,
                "l2_norm": st.solution_l2_norm,
                "converged": st.converged,
            }
        )
        print(golden["polynomial_2d"][-1], flush=True)

    golden["geometric_3d"].sort(key=lambda e: (e["degree"], e["refinements"]))
    with open(OUT, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
