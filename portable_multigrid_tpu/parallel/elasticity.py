"""Sharded vector-valued elasticity multigrid (component axis 0, slabs axis 1).

Same slab decomposition as parallel/poisson.py; the vector field adds a
leading component axis, so halos exchange on axis 1 and reductions weight
the duplicated planes across all components.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fem.assemble import assemble_rhs, l2_norm
from ..fem.mesh import HyperCubeMesh
from ..fem.space import FESpace
from ..ops.elasticity import ElasticityOperator, _elasticity_diagonal, \
    make_elasticity
from ..solvers.cg import cg
from ..solvers.chebyshev import Chebyshev, chebyshev_bounds, \
    estimate_eigenvalues, _pseudo_random_grid
from ..solvers.vcycle import MGLevel, VCycle
from .poisson import AXIS, ShardedSolveStats, _build_stacked_h_transfer, \
    _tile, _unstack
from .sharding import (
    ShardedElasticityOperator,
    ShardedPallasElasticity,
    ShardedTransfer,
    dot_weights_axis0,
    make_sharded_dot,
    partition_axis0,
    unpartition_axis0,
)


def _build_stacked_elasticity(
    space: FESpace, S: int, dtype, mu: float, lam: float
) -> ElasticityOperator:
    b = space.basis
    dim = space.dim
    n = space.mesh.cells_per_axis
    p = space.degree
    qm = np.array(1.0)
    for _ in range(dim):
        qm = np.multiply.outer(qm, b.q_weights)
    qm = qm * space.mesh.h ** (dim - 2)
    mask = space.free_mask()
    diag = _elasticity_diagonal(space, mu, lam)  # [dim, grid]
    # partition the grid axis (axis 1 of diag, axis 0 of mask)
    diag_st = np.stack(
        [
            np.stack([partition_axis0(diag[c], n, p, S)[s] for c in range(dim)])
            for s in range(S)
        ]
    )  # [S, dim, N_loc, N, N]
    return ElasticityOperator(
        dim=dim,
        degree=p,
        n=(n // S,) + (n,) * (dim - 1),
        mu=float(mu),
        lam=float(lam),
        B=_tile(b.B, S, dtype),
        Dco=_tile(b.Dco, S, dtype),
        qmetric=_tile(qm, S, dtype),
        mask=jnp.asarray(partition_axis0(mask, n, p, S), dtype),
        inv_diag=jnp.asarray(1.0 / diag_st, dtype),
    )


def _build_stacked_pallas_elasticity(
    space: FESpace, S: int, dtype, mu: float, lam: float,
    interpret: bool = False, zpad: int | None = None,
):
    """Stacked ShardedPallasElasticity for a level, or None if ineligible —
    the vector twin of parallel/poisson.py:_build_stacked_pallas.  The thin
    last-plane rows come straight from the 1D element matrices (the slab's
    last grid plane touches only its own last cell, so the partial-assembly
    row IS the element row)."""
    import dataclasses as _dc

    from ..fem.basis import make_basis
    from ..ops.elasticity import assembled_1d_gradient
    from ..ops.laplace import assembled_1d_matrices, diagonal_1d_factors
    from ..ops.pallas_elasticity import (
        elasticity_compile_ok,
        make_pallas_elasticity_slab,
    )
    from ..ops.pallas_laplace import lane_pad, slab_pallas_eligible
    from .poisson import _tile_tree
    from .sharding import ShardedPallasElasticity

    if dtype != jnp.float32 and not interpret:
        return None
    n, p = space.mesh.cells_per_axis, space.degree
    if n % S:
        return None
    n_loc = n // S
    zp = lane_pad(space) if zpad is None else zpad
    Zk = n * p + zp

    def pick(cells):
        for b_ in (16, 8, 4, 2, 1):
            # 16x16 blocks with >256 lanes crash Mosaic (scalar-kernel cap)
            if b_ == 16 and Zk > 256:
                continue
            if cells % b_ == 0 and (b_ * p) % 8 == 0:
                return b_
        return None

    bx = pick(n_loc)
    by = pick(n)
    if bx is None or by is None:
        return None
    if not (interpret or slab_pallas_eligible(space, n_loc, bx, by, zpad)):
        return None
    base = make_pallas_elasticity_slab(
        space, n_loc, dtype, mu=mu, lam=lam, bx=bx, by=by,
        interpret=interpret, zpad=zp,
    )
    if not elasticity_compile_ok(base):
        return None
    m1 = space.free_mask_1d()
    gK, gM = diagonal_1d_factors(space)

    def part(v):
        return jnp.asarray(partition_axis0(v, n, p, S), dtype)

    stacked = _tile_tree(base, S)
    stacked = _dc.replace(
        stacked,
        mask1=(part(m1),) + stacked.mask1[1:],
        dK1=(part(gK),) + stacked.dK1[1:],
        dM1=(part(gM),) + stacked.dM1[1:],
    )
    K1, M1 = assembled_1d_matrices(space)
    G1 = assembled_1d_gradient(space)
    b = make_basis(p)
    W = np.diag(b.q_weights)
    h = space.mesh.h
    Kc = (b.D.T @ W @ b.D) / h
    Mc = (b.B.T @ W @ b.B) * h
    Gc = b.D.T @ W @ b.B

    def fold(A):
        return m1[:, None] * A * m1[None, :]

    return ShardedPallasElasticity(
        axis_name=AXIS,
        n_shards=S,
        local=stacked,
        thin_kx=_tile(Kc[-1], S, dtype),
        thin_mx=_tile(Mc[-1], S, dtype),
        thin_gx=_tile(Gc[-1], S, dtype),
        thin_hx=_tile(Gc[:, -1], S, dtype),
        K1m=_tile(fold(K1), S, dtype),
        M1m=_tile(fold(M1), S, dtype),
        G1m=_tile(fold(G1), S, dtype),
        H1m=_tile(fold(G1.T), S, dtype),
    )


class ShardedElasticity:
    """h-multigrid linear elasticity sharded over a 1D device mesh."""

    def __init__(
        self,
        dim: int,
        degree: int,
        refinements: int,
        mu: float = 1.0,
        lam: float = 1.0,
        devices=None,
        dtype=jnp.float64,
        variant: str = "sumfac",
        pallas_interpret: bool = False,
        pallas_zpad: int | None = None,
    ):
        if devices is None:
            devices = jax.devices()
        self.devices = list(devices)
        S = len(self.devices)
        if S & (S - 1):
            raise ValueError("n_devices must be a power of two")
        self.n_shards = S
        self.dtype = dtype
        self.dim = dim
        self.degree = degree

        min_ref = max(int(math.ceil(math.log2(max(S, 1)))), 0)
        if refinements < min_ref:
            raise ValueError(f"need >= {min_ref} refinements for {S} shards")
        self.spaces = [
            FESpace(HyperCubeMesh(dim, r), degree)
            for r in range(min_ref, refinements + 1)
        ]
        self.mesh = Mesh(np.array(self.devices), (AXIS,))

        levels = []
        for i, sp in enumerate(self.spaces):
            op_st = None
            if variant == "pallas":
                # slab Pallas vector kernel where eligible (compile-probed);
                # pallas_zpad (tests) applies to the finest level only —
                # other levels follow the lane_pad policy
                zp = pallas_zpad if i == len(self.spaces) - 1 else None
                op_st = _build_stacked_pallas_elasticity(
                    sp, S, dtype, mu, lam, interpret=pallas_interpret,
                    zpad=zp,
                )
            elif variant != "sumfac":
                raise ValueError(f"unknown sharded variant: {variant!r}")
            if op_st is None:
                op_st = _build_stacked_elasticity(sp, S, dtype, mu, lam)
            twin = make_elasticity(sp, dtype, mu=mu, lam=lam)
            fm = np.broadcast_to(sp.free_mask()[None], (dim,) + sp.grid_shape)
            v0 = _pseudo_random_grid((dim,) + sp.grid_shape, dtype) * fm
            if i == 0:
                mn, mx = estimate_eigenvalues(
                    twin, twin.inv_diag, min(twin.n_dofs, 128),
                    jnp.asarray(v0, dtype),
                )
                alpha, beta, deg = chebyshev_bounds(mn, mx, 1e-3, None)
            else:
                mn, mx = estimate_eigenvalues(
                    twin, twin.inv_diag, 10, jnp.asarray(v0, dtype)
                )
                alpha, beta, deg = chebyshev_bounds(mn, mx, 15.0, 5)
            smoother = Chebyshev(
                degree=deg,
                op=None,  # wired to the sharded wrapper in shard_map
                # pallas levels derive the diagonal lazily from the slab's
                # partitioned 1D factors (inv_diag property); sumfac levels
                # carry the stacked assembled diagonal
                inv_diag=None if isinstance(op_st, ShardedPallasElasticity)
                else op_st.inv_diag,
                theta=_tile(np.full((), (beta + alpha) / 2.0), S, dtype),
                delta=_tile(np.full((), (beta - alpha) / 2.0), S, dtype),
            )
            transfer = (
                _build_stacked_h_transfer(self.spaces[i - 1], sp, S, dtype)
                if i > 0
                else None
            )
            levels.append(MGLevel(op=op_st, smoother=smoother, transfer=transfer))
        self.levels_stacked = tuple(levels)
        fine = self.spaces[-1]
        self.dot_w = jnp.asarray(
            dot_weights_axis0(fine.mesh.cells_per_axis, degree, S), dtype
        )
        self._solve_jit = None

    def _assemble_local(self, levels_stacked):
        S = self.n_shards
        out = []
        for lvl in levels_stacked:
            op_loc = _unstack(lvl.op)
            if isinstance(op_loc, ShardedPallasElasticity):
                sop = op_loc  # self-contained halo wrapper
            else:
                sop = ShardedElasticityOperator(
                    axis_name=AXIS, n_shards=S, local=op_loc
                )
            sm_st = lvl.smoother
            sm = Chebyshev(
                degree=sm_st.degree,
                op=sop,
                inv_diag=None if sm_st.inv_diag is None
                else sm_st.inv_diag[0],
                theta=sm_st.theta[0],
                delta=sm_st.delta[0],
            )
            tr = (
                ShardedTransfer(
                    axis_name=AXIS, n_shards=S, halo_axis=1,
                    local=_unstack(lvl.transfer),
                )
                if lvl.transfer is not None
                else None
            )
            out.append(MGLevel(op=sop, smoother=sm, transfer=tr))
        return tuple(out)

    def solve(self, rtol: float = 1e-12, verbose: bool = False):
        fine = self.spaces[-1]
        S = self.n_shards
        dim = self.dim
        n = fine.mesh.cells_per_axis
        rhs_scalar = assemble_rhs(fine)
        parts = partition_axis0(rhs_scalar, n, self.degree, S)
        rhs_st = jnp.asarray(
            np.stack(
                [np.broadcast_to(p_[None], (dim,) + p_.shape) for p_ in parts]
            ),
            self.dtype,
        )

        if self._solve_jit is None:

            def solve_local(levels_stacked, rhs_s, dot_w_s):
                levels = self._assemble_local(levels_stacked)
                rhs = rhs_s[0]
                dot = make_sharded_dot(
                    dot_w_s[0], self.dim, AXIS, lead_axes=1
                )
                mg = VCycle(
                    pre_smoothing_steps=2, post_smoothing_steps=2,
                    levels=levels,
                )
                res = cg(levels[-1].op.apply, rhs, mg.apply, rtol=rtol, dot=dot)
                return res.x[None], res.iterations, res.residual_norm, \
                    res.converged

            self._solve_jit = jax.jit(
                jax.shard_map(
                    solve_local,
                    mesh=self.mesh,
                    in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                    out_specs=(P(AXIS), P(), P(), P()),
                    check_vma=False,
                )
            )
        x_st, iters, resnorm, converged = self._solve_jit(
            self.levels_stacked, rhs_st, self.dot_w
        )
        # unpartition: [S, dim, N_loc, N, N] -> [dim, N, N, N]
        xs = np.asarray(x_st)
        x = np.stack(
            [
                unpartition_axis0(xs[:, c], n, self.degree, S)
                for c in range(dim)
            ]
        )
        norm = float(
            np.sqrt(sum(l2_norm(fine, x[c]) ** 2 for c in range(dim)))
        )
        stats = ShardedSolveStats(
            iterations=int(iters),
            residual_norm=float(resnorm),
            converged=bool(converged),
            solution_l2_norm=norm,
            n_dofs=dim * fine.n_dofs,
            n_shards=S,
            dofs_per_level=[dim * sp.n_dofs for sp in self.spaces],
        )
        if verbose:
            print(
                f" Number of degrees of freedom: {stats.n_dofs} over {S} "
                f"shards"
            )
            print(f"  Solver converged in {stats.iterations} iterations.")
            print(f"  solution norm: {stats.solution_l2_norm:.6g}")
        return x, stats
