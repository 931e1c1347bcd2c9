"""Generate golden convergence data (CPU, float64).

Runs the reference driver configurations (geometric 3D sweep + polynomial 2D
ladder, scaled to CPU-tractable sizes) and records CG iteration counts and
solution L2 norms — the two correctness oracles the reference prints
(reference: source/geometric_multigrid/program.cc:354-355,395).

Usage: python tests/generate_golden.py  (writes tests/golden_convergence.json)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
        PolynomialMultigridPoisson,
    )

    golden = {"geometric_3d": [], "polynomial_2d": []}

    for degree in (1, 2, 3, 4):
        for refinements in (1, 2, 3):
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

    for degree, levels, refinements in [(7, 7, 1), (7, 7, 2), (4, 4, 3)]:
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

    out = os.path.join(os.path.dirname(__file__), "golden_convergence.json")
    with open(out, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
