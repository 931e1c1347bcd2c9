"""Indexed (general-geometry) operator tests."""

import numpy as np
import pytest

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.fem.general_mesh import (
    perturbed_cube_mesh,
    structured_as_general,
)
from portable_multigrid_tpu.ops.indexed import (
    dense_indexed_operator,
    make_indexed_laplace,
)
from portable_multigrid_tpu.ops.laplace import make_laplace


@pytest.mark.parametrize("dim,p,r", [(1, 2, 2), (2, 2, 2), (3, 2, 1), (3, 3, 1)])
def test_indexed_equals_structured_on_cartesian(dim, p, r):
    sp = FESpace(HyperCubeMesh(dim, r), p)
    oi = make_indexed_laplace(sp)
    os_ = make_laplace(sp)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(sp.grid_shape)
    a = np.asarray(oi.apply(u.reshape(-1))).reshape(sp.grid_shape)
    b = np.asarray(os_.apply(u))
    np.testing.assert_allclose(a, b, atol=1e-13 * np.abs(b).max())
    np.testing.assert_allclose(
        np.asarray(oi.inv_diag).reshape(sp.grid_shape),
        np.asarray(os_.inv_diag),
        rtol=1e-12,
    )


@pytest.mark.parametrize("dim,p,n", [(2, 1, 4), (2, 3, 4), (3, 2, 2)])
def test_indexed_perturbed_matches_dense(dim, p, n):
    """Genuinely non-affine geometry: per-q-point Jacobians."""
    refi = int(np.log2(n))
    sp = FESpace(HyperCubeMesh(dim, refi), p)
    gm = perturbed_cube_mesh(dim, n, amplitude=0.2)
    op = make_indexed_laplace(sp, gm)
    A = dense_indexed_operator(sp, gm)
    rng = np.random.default_rng(1)
    u = rng.standard_normal(sp.n_dofs)
    got = np.asarray(op.apply(u))
    want = A @ u
    np.testing.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())
    np.testing.assert_allclose(
        1.0 / np.asarray(op.inv_diag), np.diag(A), rtol=1e-12
    )


def test_perturbed_operator_is_spd():
    sp = FESpace(HyperCubeMesh(2, 2), 2)
    gm = perturbed_cube_mesh(2, 4, amplitude=0.2)
    A = dense_indexed_operator(sp, gm)
    np.testing.assert_allclose(A, A.T, atol=1e-13)
    assert np.linalg.eigvalsh(A).min() > 0


def test_jacobians_exact_on_affine():
    """On the Cartesian mesh the Q1 mapping gives J = h I exactly."""
    mesh = HyperCubeMesh(3, 1)
    gm = structured_as_general(mesh)
    inv_jac, jxw = gm.geometry_tables(3)
    np.testing.assert_allclose(
        inv_jac,
        np.broadcast_to(np.eye(3) / mesh.h, inv_jac.shape),
        atol=1e-12,
    )
    wsum = jxw.sum()
    assert wsum == pytest.approx(1.0)  # measure of the unit cube


def test_general_geometry_multigrid():
    """Full MG solve on a deformed mesh: indexed per-q-point-Jacobian
    operators at every level, geometry-free transfers; O(10) iterations and
    dense-solve parity."""
    from portable_multigrid_tpu.models.general_geometry import (
        GeneralGeometryMultigrid,
    )

    gm = perturbed_cube_mesh(2, 8, amplitude=0.15)
    prob = GeneralGeometryMultigrid(gm, 2, 3)
    x, st = prob.solve()
    assert st.converged and st.iterations <= 12
    sp = FESpace(HyperCubeMesh(2, 3), 2)
    from portable_multigrid_tpu.ops.indexed import dense_indexed_operator

    A = dense_indexed_operator(sp, gm)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(sp.n_dofs) * sp.free_mask().reshape(-1)
    want = np.linalg.solve(A, b)
    np.testing.assert_allclose(
        np.asarray(x), want, atol=1e-9 * np.abs(want).max()
    )
