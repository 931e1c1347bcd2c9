"""Manufactured-solution convergence oracle (independent of the solver).

u(x) = prod_d sin(pi x_d)  =>  -Δu = dim·pi²·u, homogeneous Dirichlet on the
unit hyper-cube.  The L2 error of the Q_p FE solution must converge at rate
h^(p+1) — a correctness claim that does not cite this repo's own outputs
(the analog of the reference's integrate_difference verification,
reference: source/geometric_multigrid/program.cc:368-396).
"""

import numpy as np
import pytest

from portable_multigrid_tpu.fem.assemble import l2_error
from portable_multigrid_tpu.models.poisson import GeometricMultigridPoisson


def _u_exact(*coords):
    out = 1.0
    for c in coords:
        out = out * np.sin(np.pi * c)
    return out


def _solve(dim, degree, refinements):
    prob = GeometricMultigridPoisson(dim, degree, refinements)
    f = lambda *c: dim * np.pi**2 * _u_exact(*c)
    x, st = prob.solve(f=f)
    assert st.converged
    return l2_error(prob.spaces[-1], np.asarray(x), _u_exact)


@pytest.mark.parametrize(
    "degree,r0,r1",
    [(1, 3, 4), (2, 2, 3), (3, 2, 3), (4, 1, 2)],
)
def test_l2_error_rate_2d(degree, r0, r1):
    e0 = _solve(2, degree, r0)
    e1 = _solve(2, degree, r1)
    rate = np.log2(e0 / e1)
    # asymptotic rate p+1 (allow pre-asymptotic slack)
    assert rate > degree + 0.7, (e0, e1, rate)
    assert e1 < e0


@pytest.mark.parametrize("degree,r0,r1", [(2, 1, 2), (3, 1, 2)])
def test_l2_error_rate_3d(degree, r0, r1):
    e0 = _solve(3, degree, r0)
    e1 = _solve(3, degree, r1)
    rate = np.log2(e0 / e1)
    assert rate > degree + 0.7, (e0, e1, rate)


def test_l2_error_absolute_accuracy():
    """At Q3/r=3 (h=1/8) in 2D the FE solution is ~5.6e-6 accurate in L2
    (C h^4 with C ≈ 2.3 for u = sin(pi x) sin(pi y))."""
    e = _solve(2, 3, 3)
    assert 1e-6 < e < 1e-5
