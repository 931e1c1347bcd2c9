"""1D basis / quadrature unit tests."""

import numpy as np
import pytest

from portable_multigrid_tpu.fem.basis import (
    diff_matrix,
    gauss_lobatto_points,
    gauss_points,
    h_prolongation_matrix_1d,
    lagrange_deriv,
    lagrange_eval,
    make_basis,
    p_prolongation_matrix_1d,
)


@pytest.mark.parametrize("n", range(1, 10))
def test_gauss_quadrature_exactness(n):
    x, w = gauss_points(n)
    # exact for polynomials up to degree 2n-1 on [0,1]
    for k in range(2 * n):
        assert np.sum(w * x**k) == pytest.approx(1.0 / (k + 1), abs=1e-14)


@pytest.mark.parametrize("n", range(2, 10))
def test_gauss_lobatto_points(n):
    pts = gauss_lobatto_points(n)
    assert pts[0] == 0.0 and pts[-1] == 1.0
    assert np.all(np.diff(pts) > 0)


@pytest.mark.parametrize("p", range(1, 9))
def test_lagrange_partition_of_unity(p):
    nodes = gauss_lobatto_points(p + 1)
    x = np.linspace(0, 1, 17)
    V = lagrange_eval(nodes, x)
    np.testing.assert_allclose(V.sum(axis=1), 1.0, atol=1e-12)
    # delta property at the nodes
    np.testing.assert_allclose(lagrange_eval(nodes, nodes), np.eye(p + 1), atol=1e-12)


@pytest.mark.parametrize("p", range(1, 9))
def test_lagrange_derivative_exact_on_polynomials(p):
    nodes = gauss_lobatto_points(p + 1)
    x = np.linspace(0.05, 0.95, 13)
    G = lagrange_deriv(nodes, x)
    for k in range(p + 1):
        vals = nodes**k
        expected = k * x ** (k - 1) if k > 0 else np.zeros_like(x)
        np.testing.assert_allclose(G @ vals, expected, atol=1e-10)


@pytest.mark.parametrize("p", range(1, 8))
def test_collocation_identity(p):
    """D = Dco @ B: collocation gradients equal direct shape gradients."""
    b = make_basis(p)
    np.testing.assert_allclose(b.Dco @ b.B, b.D, atol=1e-11)


@pytest.mark.parametrize("p", range(1, 8))
def test_h_prolongation_reproduces_polynomials(p):
    """The two-child embedding must reproduce degree-p polynomials exactly."""
    nodes = gauss_lobatto_points(p + 1)
    M = h_prolongation_matrix_1d(p)
    fine_pts = np.concatenate([0.5 * nodes, 0.5 + 0.5 * nodes[1:]])
    for k in range(p + 1):
        np.testing.assert_allclose(M @ nodes**k, fine_pts**k, atol=1e-12)


@pytest.mark.parametrize("pc,pf", [(1, 2), (2, 3), (3, 4), (4, 7), (6, 7)])
def test_p_prolongation_reproduces_polynomials(pc, pf):
    nodes_c = gauss_lobatto_points(pc + 1)
    nodes_f = gauss_lobatto_points(pf + 1)
    M = p_prolongation_matrix_1d(pc, pf)
    for k in range(pc + 1):
        np.testing.assert_allclose(M @ nodes_c**k, nodes_f**k, atol=1e-12)


def test_diff_matrix_rows_sum_zero():
    for p in range(1, 8):
        D = diff_matrix(gauss_lobatto_points(p + 1))
        np.testing.assert_allclose(D.sum(axis=1), 0.0, atol=1e-11)
