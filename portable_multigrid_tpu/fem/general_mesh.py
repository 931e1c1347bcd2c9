"""General (unstructured) hex/quad meshes with Q1 isoparametric mapping.

The structured fast path (fem/mesh.py) covers the reference's benchmark
configurations; this module provides the general-mesh capability of the
deal.II layer the reference builds on (``Triangulation`` + ``MappingQ``,
reference: include/operators/portable_laplace_operator.h:469-482 consumes
mapping-dependent ``inv_jacobian``/``JxW`` tables through
Portable::MatrixFree): arbitrary vertex positions, per-cell Jacobians and
quadrature weights evaluated at all quadrature points.

A mesh is (vertices [V, dim], cells [E, 2^dim]) with cell vertex ordering
lexicographic in the reference cell (z slowest ... consistent with the rest
of the package: axis 0 slowest).  The mapping is (multi-)linear Q1; the
reference uses MappingQ(p) which coincides with Q1 on affine meshes (all its
drivers) — curved higher-order mappings are a possible extension.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .basis import gauss_points


def _q1_shape_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Linear shape functions and derivatives at points x in [0,1]."""
    vals = np.stack([1.0 - x, x], axis=-1)  # [nx, 2]
    grads = np.broadcast_to(np.array([-1.0, 1.0]), vals.shape).copy()
    return vals, grads


@dataclasses.dataclass(frozen=True)
class GeneralMesh:
    """Unstructured hex (3D) / quad (2D) / line (1D) mesh."""

    vertices: np.ndarray  # [V, dim]
    cells: np.ndarray  # [E, 2^dim] vertex ids, lexicographic (axis 0 slowest)

    @property
    def dim(self) -> int:
        return self.vertices.shape[1]

    @property
    def n_cells(self) -> int:
        return self.cells.shape[0]

    def cell_vertices(self) -> np.ndarray:
        """[E, 2^dim, dim] vertex coordinates per cell."""
        return self.vertices[self.cells]

    def geometry_tables(self, n_q_1d: int) -> tuple[np.ndarray, np.ndarray]:
        """Per-cell inverse Jacobians and JxW at tensor quadrature points.

        Returns (inv_jac [E, Q, dim, dim], jxw [E, Q]) with Q = n_q_1d^dim —
        the TPU-resident equivalents of ``precomputed_data.inv_jacobian`` and
        ``JxW`` (reference: include/operators/portable_laplace_operator.h:
        300-325).  inv_jac[e, q, d1, d2] = (dxi_d1 / dx_d2), so the physical
        gradient is inv_jac^T @ reference gradient.
        """
        dim = self.dim
        qp, qw = gauss_points(n_q_1d)
        vals, grads = _q1_shape_1d(qp)  # [nq, 2] each

        # tensor Q1 shape values/gradients at all quadrature points:
        # N[v, q] and dN[k][v, q] with lexicographic v (axis 0 slowest)
        nq = n_q_1d
        Q = nq**dim
        nv = 2**dim
        N = np.ones((nv, Q))
        dN = np.ones((dim, nv, Q))
        for axis in range(dim):
            # vertex bit for this axis (axis 0 slowest)
            vbits = (np.arange(nv) >> (dim - 1 - axis)) & 1  # [nv]
            # quadrature index along this axis (axis 0 slowest)
            qidx = (np.arange(Q) // (nq ** (dim - 1 - axis))) % nq
            N *= vals[qidx][:, vbits].T
            for k in range(dim):
                dN[k] *= (grads if k == axis else vals)[qidx][:, vbits].T

        xv = self.cell_vertices()  # [E, nv, dim]
        # J[e, q, d_phys, d_ref] = sum_v x[e, v, d_phys] dN[d_ref, v, q]
        J = np.einsum("evd,kvq->eqdk", xv, dN)
        detJ = np.linalg.det(J)
        if np.any(detJ <= 0):
            raise ValueError("mesh contains inverted or degenerate cells")
        Jinv = np.linalg.inv(J)  # [E, Q, d_ref, d_phys] = dxi/dx
        wq = np.array([1.0])
        for _ in range(dim):
            wq = np.kron(wq, qw)
        jxw = detJ * wq[None, :]
        return Jinv, jxw


def structured_as_general(mesh) -> GeneralMesh:
    """Convert a HyperCubeMesh to a GeneralMesh (for cross-validation)."""
    n = mesh.cells_per_axis
    dim = mesh.dim
    x1 = np.linspace(mesh.a, mesh.b, n + 1)
    grids = np.meshgrid(*([x1] * dim), indexing="ij")
    vertices = np.stack([g.reshape(-1) for g in grids], axis=-1)
    V = n + 1

    def vid(idx):
        out = 0
        for k in range(dim):
            out = out * V + idx[k]
        return out

    cells = []
    for e in range(n**dim):
        cidx = np.unravel_index(e, (n,) * dim)
        verts = []
        for v in range(2**dim):
            idx = [cidx[k] + ((v >> (dim - 1 - k)) & 1) for k in range(dim)]
            verts.append(vid(idx))
        cells.append(verts)
    return GeneralMesh(vertices=vertices, cells=np.asarray(cells))


def perturbed_cube_mesh(
    dim: int, n: int, amplitude: float = 0.15, seed: int = 0
) -> GeneralMesh:
    """A smoothly distorted unit-cube mesh (interior vertices perturbed) —
    exercises genuinely non-affine geometry in tests."""
    x1 = np.linspace(0.0, 1.0, n + 1)
    grids = np.meshgrid(*([x1] * dim), indexing="ij")
    vertices = np.stack([gg.reshape(-1) for gg in grids], axis=-1)
    rng = np.random.default_rng(seed)
    h = 1.0 / n
    interior = np.all((vertices > 1e-12) & (vertices < 1 - 1e-12), axis=1)
    vertices = vertices + np.where(
        interior[:, None],
        rng.uniform(-amplitude * h, amplitude * h, vertices.shape),
        0.0,
    )
    V = n + 1
    cells = []
    for e in range(n**dim):
        cidx = np.unravel_index(e, (n,) * dim)
        verts = []
        for v in range(2**dim):
            idx = [cidx[k] + ((v >> (dim - 1 - k)) & 1) for k in range(dim)]
            out = 0
            for k in range(dim):
                out = out * V + idx[k]
            verts.append(out)
        cells.append(verts)
    return GeneralMesh(vertices=vertices, cells=np.asarray(cells))
