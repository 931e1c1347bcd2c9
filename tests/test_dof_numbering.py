"""Unstructured DoF enumeration: orientation matching + native/Python parity."""

from itertools import permutations, product

import numpy as np
import pytest

from portable_multigrid_tpu.fem.basis import gauss_lobatto_points
from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.fem.general_mesh import (
    GeneralMesh,
    perturbed_cube_mesh,
    structured_as_general,
)
from portable_multigrid_tpu.fem.dof_numbering import enumerate_dofs


def _rotations(dim):
    syms = []
    for perm in permutations(range(dim)):
        for flips in product([0, 1], repeat=dim):
            M = np.zeros((dim, dim))
            for k, pk in enumerate(perm):
                M[k, pk] = -1 if flips[k] else 1
            if np.linalg.det(M) > 0:
                syms.append((perm, flips))
    return syms


def rotate_cells(mesh: GeneralMesh, seed=0) -> GeneralMesh:
    """Randomly re-orient every cell (valid rotations of the reference cube)."""
    dim = mesh.dim
    syms = _rotations(dim)
    rng = np.random.default_rng(seed)
    cells = mesh.cells.copy()
    nv = 2**dim
    for e in range(cells.shape[0]):
        perm, flips = syms[rng.integers(len(syms))]
        newc = np.empty(nv, dtype=cells.dtype)
        for v in range(nv):
            b = [(v >> (dim - 1 - k)) & 1 for k in range(dim)]
            ob = [0] * dim
            for k in range(dim):
                ob[perm[k]] = b[k] ^ flips[k]
            ov = 0
            for k in range(dim):
                ov = ov * 2 + ob[k]
            newc[v] = cells[e, ov]
        cells[e] = newc
    return GeneralMesh(mesh.vertices, cells)


def node_positions(gmesh: GeneralMesh, p: int) -> np.ndarray:
    """Physical positions of nodal points through the Q1 mapping."""
    dim = gmesh.dim
    nodes = gauss_lobatto_points(p + 1)
    ndof = (p + 1) ** dim
    nv = 2**dim
    pos = np.zeros((gmesh.n_cells, ndof, dim))
    xv = gmesh.cell_vertices()
    for loc in range(ndof):
        rem = loc
        ii = []
        for k in range(dim):
            ii.append(rem // (p + 1) ** (dim - 1 - k))
            rem %= (p + 1) ** (dim - 1 - k)
        w = np.ones(nv)
        for k in range(dim):
            vb = (np.arange(nv) >> (dim - 1 - k)) & 1
            x = nodes[ii[k]]
            w = w * np.where(vb == 1, x, 1 - x)
        pos[:, loc, :] = np.einsum("v,evd->ed", w, xv)
    return pos


@pytest.mark.parametrize("dim,p,r", [(1, 2, 2), (2, 3, 2), (3, 2, 1), (3, 4, 1)])
def test_matches_structured_numbering_up_to_permutation(dim, p, r):
    sp = FESpace(HyperCubeMesh(dim, r), p)
    gm = structured_as_general(sp.mesh)
    n_dofs, l2g, mask = enumerate_dofs(gm, p)
    l2g_s = sp.local_to_global()
    assert n_dofs == sp.n_dofs
    perm = -np.ones(sp.n_dofs, dtype=np.int64)
    for e in range(l2g.shape[0]):
        for k in range(l2g.shape[1]):
            s, u = l2g_s[e, k], l2g[e, k]
            assert perm[s] in (-1, u)
            perm[s] = u
    assert len(set(perm)) == sp.n_dofs
    np.testing.assert_array_equal(mask[perm], sp.free_mask().reshape(-1))


@pytest.mark.parametrize("dim,p", [(2, 3), (3, 2), (3, 3), (3, 4)])
def test_orientation_matching_on_rotated_cells(dim, p):
    """Shared DoFs must map to identical physical points even when cells
    disagree on local orientation (edge flips + all 8 face symmetries)."""
    mesh = structured_as_general(HyperCubeMesh(dim, 1 if dim == 3 else 2))
    rmesh = rotate_cells(mesh, seed=dim * 10 + p)
    n_dofs, l2g, _ = enumerate_dofs(rmesh, p)
    pos = node_positions(rmesh, p)
    ref = np.full((n_dofs, dim), np.nan)
    for e in range(l2g.shape[0]):
        for k in range(l2g.shape[1]):
            g = l2g[e, k]
            if np.isnan(ref[g, 0]):
                ref[g] = pos[e, k]
            else:
                np.testing.assert_allclose(ref[g], pos[e, k], atol=1e-12)


def test_native_matches_python():
    from portable_multigrid_tpu.native import (
        enumerate_dofs_native,
        native_available,
    )

    if not native_available():
        pytest.skip("native library unavailable (no g++)")
    for dim, p, n in [(2, 3, 4), (3, 2, 4), (3, 4, 2)]:
        refi = int(np.log2(n))
        gm = rotate_cells(
            perturbed_cube_mesh(dim, n, amplitude=0.15), seed=7
        )
        r_py = enumerate_dofs(gm, p)
        r_cpp = enumerate_dofs_native(gm.cells, dim, p)
        assert r_py[0] == r_cpp[0]
        np.testing.assert_array_equal(r_py[1], r_cpp[1])
        np.testing.assert_array_equal(r_py[2], r_cpp[2])


def test_unstructured_solve_matches_dense():
    """Full unstructured pipeline: rotated + perturbed mesh, Jacobi CG."""
    import jax.numpy as jnp

    from portable_multigrid_tpu.ops.indexed import (
        dense_unstructured_operator,
        make_unstructured_laplace,
    )
    from portable_multigrid_tpu.solvers.cg import cg

    gm = rotate_cells(perturbed_cube_mesh(2, 4, amplitude=0.2), seed=3)
    op = make_unstructured_laplace(gm, 3)
    A = dense_unstructured_operator(gm, 3)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(op.n_dofs)
    np.testing.assert_allclose(
        np.asarray(op.apply(u)), A @ u, atol=1e-12 * np.abs(A @ u).max()
    )
    b = jnp.asarray(np.asarray(op.mask) * rng.standard_normal(op.n_dofs))
    res = cg(op.apply, b, lambda v: op.inv_diag * v, rtol=1e-12)
    assert bool(res.converged)
    x_dense = np.linalg.solve(A, np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(res.x), x_dense, atol=1e-8 * np.abs(x_dense).max()
    )


def test_native_valence_weights():
    from portable_multigrid_tpu.native import (
        native_available,
        valence_weights_native,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    sp = FESpace(HyperCubeMesh(3, 2), 2)
    l2g = sp.local_to_global()
    w = valence_weights_native(l2g, sp.n_dofs)
    counts = np.bincount(l2g.reshape(-1), minlength=sp.n_dofs)
    np.testing.assert_allclose(w, 1.0 / counts)
