"""Indexed (general-geometry) matrix-free Laplace operator.

The general path of the framework: per-cell gather through an explicit
``local_to_global`` table and per-cell/per-quadrature-point geometry
(inv_jacobian, JxW), exactly the data model of the reference's
``Portable::MatrixFree`` backbone (reference:
include/operators/portable_laplace_operator.h:251-257 [l2g gather],
:300-325 [per-q-point inv_jacobian/JxW metric application], :361-380
[scatter]).  The scatter uses XLA's deterministic scatter-add instead of
atomics/coloring (SURVEY.md §7 point 2).

Use this path for distorted/mapped meshes; the structured variants in
ops/laplace.py are the fast path for Cartesian uniform grids.  Currently the
DoF topology comes from a structured FESpace (arbitrary vertex positions,
structured connectivity); fully unstructured DoF enumeration is provided by
the native setup extension (see portable_multigrid_tpu/native).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem.assemble import gradient_matrices
from ..fem.general_mesh import GeneralMesh
from ..fem.space import FESpace
from ..utils.pytree import pytree_dataclass, static_field
from .structured import contract


@pytree_dataclass
class IndexedLaplaceOperator:
    """Matrix-free Laplace with explicit gather/scatter + general geometry."""

    dim: int = static_field()
    degree: int = static_field()
    n_dofs: int = static_field()
    precision: str = static_field(default="highest")
    l2g: jnp.ndarray = None  # [E, (p+1)^dim] int32
    metric: jnp.ndarray = None  # [E, Q, dim, dim]: JxW * Jinv Jinv^T
    B: jnp.ndarray = None
    Dco: jnp.ndarray = None
    mask: jnp.ndarray = None  # [n_dofs] flat free mask
    inv_diag: jnp.ndarray = None  # [n_dofs] flat

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        u = u.reshape(self.n_dofs)
        dim, B, Dco = self.dim, self.B, self.Dco
        q = B.shape[0]
        um = u * self.mask
        ue = um[self.l2g].reshape((-1,) + (q,) * dim)  # [E, q..q]
        qaxes = list(range(1, dim + 1))

        v = ue
        for ax in qaxes:
            v = contract(v, B, ax, precision=self.precision)
        grads = [
            contract(v, Dco, ax, precision=self.precision) for ax in qaxes
        ]
        G = jnp.stack(grads, axis=-1)  # [E, q..q, dim]
        M = self.metric.reshape(G.shape[:-1] + (dim, dim))
        W = jnp.einsum("...rs,...s->...r", M, G, precision=self.precision)

        r = None
        for d, ax in enumerate(qaxes):
            g = jnp.tensordot(
                W[..., d], Dco, axes=((ax,), (0,)), precision=self.precision
            )
            g = jnp.moveaxis(g, -1, ax)
            r = g if r is None else r + g
        for ax in qaxes:
            r = jnp.tensordot(r, B, axes=((ax,), (0,)), precision=self.precision)
            r = jnp.moveaxis(r, -1, ax)

        au = jnp.zeros(self.n_dofs, u.dtype).at[self.l2g.reshape(-1)].add(
            r.reshape(-1)
        )
        return self.mask * au + (1.0 - self.mask) * u

    vmult = apply


def _metric_tables(gmesh: GeneralMesh, degree: int) -> np.ndarray:
    inv_jac, jxw = gmesh.geometry_tables(degree + 1)
    # metric[r, s] = JxW * sum_d Jinv[r, d] Jinv[s, d]
    return np.einsum("eqrd,eqsd,eq->eqrs", inv_jac, inv_jac, jxw)


def _indexed_diagonal(
    metric: np.ndarray, l2g: np.ndarray, degree: int, dim: int, n_dofs: int
) -> np.ndarray:
    G = gradient_matrices(degree, dim)  # G_r[Q, ndof] reference gradients
    E = metric.shape[0]
    d_loc = np.zeros((E, G[0].shape[1]))
    for r in range(dim):
        for s in range(dim):
            d_loc += np.einsum("eq,ql,ql->el", metric[:, :, r, s], G[r], G[s])
    diag = np.zeros(n_dofs)
    np.add.at(diag, l2g.reshape(-1), d_loc.reshape(-1))
    return diag


def make_indexed_laplace(
    space: FESpace,
    gmesh: GeneralMesh | None = None,
    dtype=jnp.float64,
) -> IndexedLaplaceOperator:
    """Build the indexed operator.

    ``space`` provides the DoF topology and constraints; ``gmesh`` provides
    the geometry (defaults to the space's own Cartesian mesh, in which case
    the operator equals the structured variants — used for cross-validation).
    """
    from ..fem.general_mesh import structured_as_general

    if gmesh is None:
        gmesh = structured_as_general(space.mesh)
    if gmesh.n_cells != space.mesh.n_cells:
        raise ValueError("geometry mesh does not match the DoF space")
    b = space.basis
    l2g = space.local_to_global()
    metric = _metric_tables(gmesh, space.degree)
    mask = space.free_mask().reshape(-1)
    diag = _indexed_diagonal(
        metric, l2g, space.degree, space.dim, space.n_dofs
    )
    diag = diag * mask + (1.0 - mask)
    return IndexedLaplaceOperator(
        dim=space.dim,
        degree=space.degree,
        n_dofs=space.n_dofs,
        l2g=jnp.asarray(l2g, jnp.int32),
        metric=jnp.asarray(metric, dtype),
        B=jnp.asarray(b.B, dtype),
        Dco=jnp.asarray(b.Dco, dtype),
        mask=jnp.asarray(mask, dtype),
        inv_diag=jnp.asarray(1.0 / diag, dtype),
    )


def make_unstructured_laplace(
    gmesh: GeneralMesh, degree: int, dtype=jnp.float64, dofs=None
) -> IndexedLaplaceOperator:
    """Fully unstructured path: DoF topology from the native enumerator
    (edge/face orientation matching), geometry from the Q1 mapping.

    Homogeneous Dirichlet on the whole mesh boundary (faces shared by a
    single cell), matching the reference drivers' boundary_id 0.
    ``dofs`` optionally passes a precomputed (n_dofs, l2g, mask) pack.
    """
    from ..fem.basis import make_basis
    from ..native import enumerate_dofs

    n_dofs, l2g, mask = dofs if dofs is not None else enumerate_dofs(
        gmesh, degree
    )
    b = make_basis(degree)
    metric = _metric_tables(gmesh, degree)
    diag = _indexed_diagonal(metric, l2g, degree, gmesh.dim, n_dofs)
    diag = diag * mask + (1.0 - mask)
    return IndexedLaplaceOperator(
        dim=gmesh.dim,
        degree=degree,
        n_dofs=n_dofs,
        l2g=jnp.asarray(l2g, jnp.int32),
        metric=jnp.asarray(metric, dtype),
        B=jnp.asarray(b.B, dtype),
        Dco=jnp.asarray(b.Dco, dtype),
        mask=jnp.asarray(mask, dtype),
        inv_diag=jnp.asarray(1.0 / diag, dtype),
    )


@pytree_dataclass
class IndexedTransfer:
    """Two-level h-transfer on unstructured meshes via per-cell embeddings.

    The unstructured analog of ops/transfer.py:Transfer, mirroring the
    reference's GeometricTransfer data model (per-cell coarse/fine DoF index
    tables + the 1D embedding matrix + 1/valence weights; reference:
    include/multigrid/portable_geometric_transfer.h:33-86,1329-1487) —
    except the per-child tensor embedding is applied as one batched einsum
    and the scatter is XLA's deterministic scatter-add.

    prolongate:  gather coarse cell DoFs (masked) -> per-child embedding
                 matmul -> scatter-add to fine -> 1/valence * fine-mask.
    restrict:    the exact transpose (weights first).
    """

    n_c: int = static_field()
    n_f: int = static_field()
    l2g_c: jnp.ndarray = None  # [Ec, ndof] int32
    l2g_f: jnp.ndarray = None  # [Ec, 2^dim, ndof] int32 (children by parent)
    Mch: jnp.ndarray = None  # [2^dim, ndof_f, ndof_c] child embeddings
    w_f: jnp.ndarray = None  # [n_f] 1/valence * fine mask
    mask_c: jnp.ndarray = None  # [n_c]

    def prolongate(self, c: jnp.ndarray) -> jnp.ndarray:
        c = c.reshape(self.n_c) * self.mask_c
        cc = c[self.l2g_c]  # [Ec, ndof]
        fe = jnp.einsum("kfl,el->ekf", self.Mch, cc)
        out = jnp.zeros(self.n_f, c.dtype).at[self.l2g_f.reshape(-1)].add(
            fe.reshape(-1)
        )
        return out * self.w_f

    def prolongate_and_add(self, dst, c):
        return dst + self.prolongate(c)

    def restrict(self, f: jnp.ndarray) -> jnp.ndarray:
        fw = f.reshape(self.n_f) * self.w_f
        fe = fw[self.l2g_f]  # [Ec, 2^dim, ndof]
        ce = jnp.einsum("kfl,ekf->el", self.Mch, fe)
        out = jnp.zeros(self.n_c, f.dtype).at[self.l2g_c.reshape(-1)].add(
            ce.reshape(-1)
        )
        return out * self.mask_c

    def restrict_and_add(self, dst, f):
        return dst + self.restrict(f)


def make_unstructured_h_transfer(
    gmesh_c: GeneralMesh,
    degree: int,
    coarse_dofs: tuple,
    fine_dofs: tuple,
    dtype=jnp.float64,
) -> IndexedTransfer:
    """Transfer between an unstructured mesh and its refine_general_mesh
    child (children parent-major, child index lexicographic).

    ``coarse_dofs``/``fine_dofs`` are (n_dofs, l2g, mask) as returned by the
    native enumerator for the two levels."""
    from ..fem.basis import h_prolongation_matrix_1d

    dim = gmesh_c.dim
    p = degree
    n_c, l2g_c, mask_c = coarse_dofs
    n_f, l2g_f, mask_f = fine_dofs
    Ec = gmesh_c.n_cells
    if l2g_f.shape[0] != Ec * 2**dim:
        raise ValueError("fine mesh is not the refinement of the coarse mesh")

    M1 = h_prolongation_matrix_1d(p)  # [2p+1, p+1]
    halves = (M1[: p + 1], M1[p:])  # child 0 / child 1 along one axis
    Mch = []
    for c in range(2**dim):
        M = np.array([[1.0]])
        for k in range(dim):
            M = np.kron(M, halves[(c >> (dim - 1 - k)) & 1])
        Mch.append(M)
    Mch = np.stack(Mch)  # [2^dim, ndof, ndof]

    # each fine DoF appears once per fine cell containing it == its valence
    counts = np.zeros(n_f)
    np.add.at(counts, l2g_f.reshape(-1), 1.0)
    w = mask_f / np.maximum(counts, 1.0)
    return IndexedTransfer(
        n_c=int(n_c),
        n_f=int(n_f),
        l2g_c=jnp.asarray(l2g_c, jnp.int32),
        l2g_f=jnp.asarray(
            l2g_f.reshape(Ec, 2**dim, -1), jnp.int32
        ),
        Mch=jnp.asarray(Mch, dtype),
        w_f=jnp.asarray(w, dtype),
        mask_c=jnp.asarray(mask_c, dtype),
    )


def dense_unstructured_operator(gmesh: GeneralMesh, degree: int) -> np.ndarray:
    """Dense golden operator on a fully unstructured mesh (tiny meshes)."""
    from ..fem.basis import make_basis
    from ..native import enumerate_dofs

    n_dofs, l2g, mask = enumerate_dofs(gmesh, degree)
    metric = _metric_tables(gmesh, degree)
    G = gradient_matrices(degree, gmesh.dim)
    A = np.zeros((n_dofs, n_dofs))
    for e in range(l2g.shape[0]):
        A_loc = np.zeros((l2g.shape[1], l2g.shape[1]))
        for r in range(gmesh.dim):
            for s in range(gmesh.dim):
                A_loc += np.einsum(
                    "q,ql,qm->lm", metric[e, :, r, s], G[r], G[s]
                )
        idx = l2g[e]
        A[np.ix_(idx, idx)] += A_loc
    A = A * mask[:, None] * mask[None, :]
    A[np.arange(n_dofs), np.arange(n_dofs)] += 1.0 - mask
    return A


def dense_indexed_operator(space: FESpace, gmesh: GeneralMesh) -> np.ndarray:
    """Dense golden operator for general geometry (tiny meshes)."""
    metric = _metric_tables(gmesh, space.degree)
    G = gradient_matrices(space.degree, space.dim)
    l2g = space.local_to_global()
    N = space.n_dofs
    A = np.zeros((N, N))
    for e in range(l2g.shape[0]):
        A_loc = np.zeros((l2g.shape[1], l2g.shape[1]))
        for r in range(space.dim):
            for s in range(space.dim):
                A_loc += np.einsum(
                    "q,ql,qm->lm", metric[e, :, r, s], G[r], G[s]
                )
        idx = l2g[e]
        A[np.ix_(idx, idx)] += A_loc
    m = space.free_mask().reshape(-1)
    A = A * m[:, None] * m[None, :]
    A[np.arange(N), np.arange(N)] += 1.0 - m
    return A
