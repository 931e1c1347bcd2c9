"""Arbitrary (non-power-of-two) shard counts via extended-domain padding.

The reference runs under any ``mpirun -n N`` (reference:
source/geometric_multigrid/program.cc:452); deal.II's tree partitioner hands
each rank an uneven slab.  ``jax.shard_map`` needs UNIFORM per-shard block
shapes, so instead of uneven slabs the TPU-native answer pads the SHARDED
axis with dead cells up to ``n_ext = S * 2^k`` (k = refinements -
floor(log2 S)), all on the same lattice spacing:

  * dead DoFs (x > 1) are constraint-masked: A_eff rows are identity, rhs is
    zero, transfers carry zero weights — the live sub-block IS the original
    unit-cube problem, bit-for-bit (the live/dead interface plane x = 1 was
    already a Dirichlet plane);
  * every extended level has S | cells, so the whole hierarchy shards with
    the uniform-slab machinery (parallel/sharding.py) unchanged — down to
    the S-cell coarsest level (ONE cell slab per shard), which runs the
    reference's Chebyshev-as-solver coarse solve;
  * padding overhead along the sharded axis is S / 2^floor(log2 S) in
    [1, 2): e.g. 6 chips pad 1.5x on one axis (the dead cells are masked
    compute, not extra iterations).

Compared to the power-of-two path the hierarchy bottoms out at S cells
instead of 1 (halving S further is impossible for odd S) — iteration counts
therefore need not EXACTLY match the single-device hierarchy; the tests pin
O(1) counts and solution equality on the live region instead.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..fem.assemble import assemble_rhs, l2_norm
from ..fem.basis import h_prolongation_matrix_1d
from ..fem.mesh import HyperCubeMesh
from ..fem.space import FESpace
from ..ops.laplace import (
    LaplaceOperator,
    assembled_1d_matrices,
    make_laplace,
)
from ..ops.transfer import Transfer, _weights_1d
from ..solvers.chebyshev import (
    Chebyshev,
    _pseudo_random_grid,
    chebyshev_bounds,
    estimate_eigenvalues,
)
from .poisson import (
    AXIS,
    ShardedGeometricPoisson,
    ShardedSolveStats,
    _partial_assembled_1d,
    _tile,
    _tile_tree,
)
from .sharding import dot_weights_axis0, partition_axis0, unpartition_axis0


def _ext_mask0(n0: int, live: int, p: int) -> np.ndarray:
    """Axis-0 free mask on the extended grid: Dirichlet at x=0 and x=1
    (= plane live*p), dead region beyond entirely constrained."""
    m = np.zeros(n0 * p + 1)
    m[1: live * p] = 1.0
    return m


def _ext_axis0_level(sp: FESpace, n0: int):
    """(K0, M0, mask0, dK0, dM0) for the extended axis-0 lattice of n0 cells
    at the level's spacing (full assembly; masks separate)."""
    live = sp.mesh.cells_per_axis
    p = sp.degree
    K0, M0 = _partial_assembled_1d(sp, n0)  # full assembly over n0 cells
    m0 = _ext_mask0(n0, live, p)
    return K0, M0, m0, np.diag(K0).copy(), np.diag(M0).copy()


def _dense_coarse_bounds(sp: FESpace, n0: int):
    """EXACT extreme eigenvalues of the Jacobi-preconditioned coarsest
    extended operator via a host-side dense eigensolve (the level is tiny;
    low-precision CG-Lanczos at hundreds of iterations breaks down)."""
    p = sp.degree
    live = sp.mesh.cells_per_axis
    K1, M1 = assembled_1d_matrices(sp)
    m1 = sp.free_mask_1d()
    K0, M0, m0, _, _ = _ext_axis0_level(sp, n0)

    def msk(A, m):
        return m[:, None] * A * m[None, :]

    K0m, M0m = msk(K0, m0), msk(M0, m0)
    K1m, M1m = msk(K1, m1), msk(M1, m1)
    if sp.dim == 3:
        A = (np.kron(K0m, np.kron(M1m, M1m))
             + np.kron(M0m, np.kron(K1m, M1m))
             + np.kron(M0m, np.kron(M1m, K1m)))
        mask = np.kron(m0, np.kron(m1, m1))
    else:
        A = np.kron(K0m, M1m) + np.kron(M0m, K1m)
        mask = np.kron(m0, m1)
    A = A + np.diag(1.0 - mask)
    dinv = 1.0 / np.sqrt(np.diag(A))
    ev = np.linalg.eigvalsh(dinv[:, None] * A * dinv[None, :])
    return float(ev[0]), float(ev[-1])


def _ext_operator(sp: FESpace, n0: int, dtype) -> LaplaceOperator:
    """Single-device twin on the full extended (anisotropic) grid."""
    dim = sp.dim
    p = sp.degree
    live = sp.mesh.cells_per_axis
    K1, M1 = assembled_1d_matrices(sp)
    K0, M0, m0, dK0, dM0 = _ext_axis0_level(sp, n0)
    tw = make_laplace(sp, dtype, variant="kron")  # template for B/Dco/qmetric
    m1 = sp.free_mask_1d()
    from ..ops.laplace import diagonal_1d_factors

    gK, gM = diagonal_1d_factors(sp)
    return LaplaceOperator(
        dim=dim,
        degree=p,
        n=(n0,) + (live,) * (dim - 1),
        variant="kron",
        B=tw.B,
        Dco=tw.Dco,
        qmetric=tw.qmetric,
        mask1=(jnp.asarray(m0, dtype),)
        + (jnp.asarray(m1, dtype),) * (dim - 1),
        dK1=(jnp.asarray(dK0, dtype),)
        + (jnp.asarray(gK, dtype),) * (dim - 1),
        dM1=(jnp.asarray(dM0, dtype),)
        + (jnp.asarray(gM, dtype),) * (dim - 1),
        Kg=(jnp.asarray(K0, dtype),) + (jnp.asarray(K1, dtype),) * (dim - 1),
        Mg=(jnp.asarray(M0, dtype),) + (jnp.asarray(M1, dtype),) * (dim - 1),
    )


class ExtendedShardedPoisson(ShardedGeometricPoisson):
    """h-multigrid Poisson over ANY number of chips (1D mesh, kron path)."""

    def __init__(
        self,
        dim: int,
        degree: int,
        refinements: int,
        devices=None,
        dtype=jnp.float64,
    ):
        if devices is None:
            devices = jax.devices()
        self.devices = list(devices)
        S = len(self.devices)
        self.n_shards = S
        self.dtype = dtype
        self.dim = dim
        self.degree = degree
        self.variant = "kron"
        f = int(math.floor(math.log2(S)))
        if refinements < f:
            raise ValueError(f"need >= {f} refinements for {S} shards")
        k = refinements - f
        # level j = 0..k: n0 = S*2^j extended cells, live = 2^(f+j)
        self.spaces = [
            FESpace(HyperCubeMesh(dim, f + j), degree) for j in range(k + 1)
        ]
        self.n0s = [S * (1 << j) for j in range(k + 1)]
        self.n_replicated = 0
        self.mesh = Mesh(np.array(self.devices), (AXIS,))

        levels = []
        from ..solvers.vcycle import MGLevel

        for j, (sp, n0) in enumerate(zip(self.spaces, self.n0s)):
            coarse = j == 0
            op_st = self._build_op(sp, n0, S, dtype)
            if coarse and (n0 * degree + 1) * sp.points_per_axis ** (
                    dim - 1) <= 20000:
                # the coarsest extended level is S cells (not the
                # reference's 1): m() eig-CG iterations in low precision
                # break down into degenerate estimates, so take the EXACT
                # extremes from a host-side dense eigensolve instead
                mn, mx = _dense_coarse_bounds(sp, n0)
            else:
                twin = _ext_operator(sp, n0, dtype)
                shape = tuple(nd * degree + 1
                              for nd in (n0,) + (sp.mesh.cells_per_axis,)
                              * (dim - 1))
                v0 = _pseudo_random_grid(shape, dtype) * np.asarray(twin.mask)
                n_iter = min(twin.n_dofs, 256) if coarse else 10
                mn, mx = estimate_eigenvalues(
                    twin, None, n_iter, jnp.asarray(v0, dtype)
                )
            if coarse:
                alpha, beta, deg = chebyshev_bounds(mn, mx, 1e-3, None)
            else:
                alpha, beta, deg = chebyshev_bounds(mn, mx, 15.0, 5)
            smoother = Chebyshev(
                degree=deg, op=None, inv_diag=None,
                theta=_tile(np.full((), (beta + alpha) / 2.0), S, dtype),
                delta=_tile(np.full((), (beta - alpha) / 2.0), S, dtype),
            )
            tr = None
            if j > 0:
                tr = self._build_transfer(
                    self.spaces[j - 1], self.n0s[j - 1], sp, n0, S, dtype
                )
            levels.append(MGLevel(op=op_st, smoother=smoother, transfer=tr))
        self.levels_stacked = tuple(levels)
        fine = self.spaces[-1]
        self.dot_w = jnp.asarray(
            dot_weights_axis0(self.n0s[-1], degree, S), dtype
        )
        self._solve_jit = None

    # ------------------------------------------------------------------
    def _build_op(self, sp: FESpace, n0: int, S: int, dtype):
        dim = sp.dim
        p = sp.degree
        live = sp.mesh.cells_per_axis
        n_loc = n0 // S
        K1, M1 = assembled_1d_matrices(sp)
        K0s, M0s = _partial_assembled_1d(sp, n_loc)  # uniform slab partial
        _, _, m0, dK0, dM0 = _ext_axis0_level(sp, n0)
        tw = make_laplace(sp, dtype, variant="kron")
        m1 = sp.free_mask_1d()
        from ..ops.laplace import diagonal_1d_factors

        gK, gM = diagonal_1d_factors(sp)

        def part(v):
            return jnp.asarray(partition_axis0(v, n0, p, S), dtype)

        return LaplaceOperator(
            dim=dim,
            degree=p,
            n=(n_loc,) + (live,) * (dim - 1),
            variant="kron",
            B=_tile(np.asarray(tw.B), S, dtype),
            Dco=_tile(np.asarray(tw.Dco), S, dtype),
            qmetric=_tile(np.asarray(tw.qmetric), S, dtype),
            mask1=(part(m0),) + (_tile(m1, S, dtype),) * (dim - 1),
            dK1=(part(dK0),) + (_tile(gK, S, dtype),) * (dim - 1),
            dM1=(part(dM0),) + (_tile(gM, S, dtype),) * (dim - 1),
            Kg=(_tile(K0s, S, dtype),) + (_tile(K1, S, dtype),) * (dim - 1),
            Mg=(_tile(M0s, S, dtype),) + (_tile(M1, S, dtype),) * (dim - 1),
        )

    def _build_transfer(self, csp, cn0, fsp, fn0, S, dtype):
        p = csp.degree
        dim = csp.dim
        n_c_yz = csp.mesh.cells_per_axis
        M1 = h_prolongation_matrix_1d(p)
        wf0 = _weights_1d(cn0, 2 * p) * _ext_mask0(
            fn0, fsp.mesh.cells_per_axis, p
        )
        mc0 = _ext_mask0(cn0, n_c_yz, p)
        wf_yz = _weights_1d(n_c_yz, 2 * p) * fsp.free_mask_1d()
        mc_yz = csp.free_mask_1d()
        return Transfer(
            dim=dim,
            n_coarse=(cn0 // S,) + (n_c_yz,) * (dim - 1),
            stride_c=p,
            stride_f=2 * p,
            M1=_tile(M1, S, dtype),
            wmask_f=(jnp.asarray(partition_axis0(wf0, fn0, p, S), dtype),)
            + (_tile(wf_yz, S, dtype),) * (dim - 1),
            mask_c1=(jnp.asarray(partition_axis0(mc0, cn0, p, S), dtype),)
            + (_tile(mc_yz, S, dtype),) * (dim - 1),
        )

    # ------------------------------------------------------------------
    def solve(
        self,
        rtol: float = 1e-12,
        pre_smoothing_steps: int = 2,
        post_smoothing_steps: int = 2,
        verbose: bool = False,
    ):
        fine = self.spaces[-1]
        S = self.n_shards
        p = self.degree
        n0 = self.n0s[-1]
        live_pts = fine.points_per_axis
        # rhs: the unit-cube assembly embedded into the extended grid (the
        # interface plane x=1 is Dirichlet-masked in both, the dead region
        # is identically zero)
        rhs_live = assemble_rhs(fine)
        ext_shape = (n0 * p + 1,) + rhs_live.shape[1:]
        rhs = np.zeros(ext_shape)
        rhs[:live_pts] = rhs_live
        rhs_st = jnp.asarray(partition_axis0(rhs, n0, p, S), self.dtype)
        if self._solve_jit is None:
            self._solve_jit = self._make_solve(
                rtol, pre_smoothing_steps, post_smoothing_steps
            )
        x_st, iters, resnorm, converged = self._solve_jit(
            self.levels_stacked, rhs_st, self.dot_w
        )
        x_ext = unpartition_axis0(np.asarray(x_st), n0, p, S)
        x = x_ext[:live_pts]
        stats = ShardedSolveStats(
            iterations=int(iters),
            residual_norm=float(resnorm),
            converged=bool(converged),
            solution_l2_norm=l2_norm(fine, x),
            n_dofs=fine.n_dofs,
            n_shards=S,
            dofs_per_level=[sp.n_dofs for sp in self.spaces],
        )
        if verbose:
            print(
                f" {stats.n_dofs} live DoFs over {S} shards "
                f"(extended axis: {n0} cells, live {fine.mesh.cells_per_axis})"
            )
            print(f"  Solver converged in {stats.iterations} iterations.")
            print(f"  solution norm: {stats.solution_l2_norm:.6g}")
        return x, stats
