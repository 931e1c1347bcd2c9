"""Poisson model problems: the two reference drivers, rebuilt TPU-native.

  * :class:`GeometricMultigridPoisson` — dim-D Poisson on the unit hyper-cube,
    f ≡ 1, homogeneous Dirichlet on the whole boundary, h-multigrid over the
    geometric coarsening sequence, Chebyshev(5) smoothing, V(2,2), CG to
    1e-12 * ||b|| (reference: source/geometric_multigrid/program.cc).
  * :class:`PolynomialMultigridPoisson` — same PDE on one mesh with a
    polynomial ladder p_l = p - (L-1-l)
    (reference: source/polynomial_multigrid/program.cc:149-159).

Setup (meshes, DoFs, masks, 1D matrices, RHS, eigenvalue estimation) is
host-side; the solve is one jitted function (CG with the V-cycle traced into
the loop body).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..fem.assemble import assemble_rhs, l2_norm
from ..fem.mesh import HyperCubeMesh, geometric_coarsening_sequence
from ..fem.space import FESpace
from ..ops.laplace import make_laplace
from ..ops.transfer import make_h_transfer, make_p_transfer
from ..solvers.cg import CGResult, cg
from ..solvers.chebyshev import make_chebyshev
from ..solvers.vcycle import MGLevel, VCycle


@dataclasses.dataclass
class SolveStats:
    iterations: int
    residual_norm: float
    converged: bool
    solution_l2_norm: float
    n_dofs: int
    dofs_per_level: list


def _build_level(
    space: FESpace,
    dtype,
    coarse: bool,
    variant: str = "sumfac",
    coefficient=None,
) -> MGLevel:
    smoother_op = None
    if coefficient is not None:
        # variable coefficients run the qdense MXU path by default (two
        # large element matmuls around a q-point scale — ~40x the sumfac
        # throughput on TPU); coarse levels are re-discretizations of the
        # same coefficient (standard geometric MG).  PMG_VARCOEFF_VARIANT
        # opts back into sumfac (the low-memory general path).
        vc = os.environ.get("PMG_VARCOEFF_VARIANT", "qdense")
        op = make_laplace(space, dtype, variant=vc, coefficient=coefficient)
    elif variant == "auto":
        from ..ops.pallas_laplace import PallasLaplaceOperator, make_laplace_auto
        from ..ops.pallas_laplace2d import PallasLaplace2D

        pallas_types = (PallasLaplaceOperator, PallasLaplace2D)
        op = make_laplace_auto(space, dtype)
        if isinstance(op, pallas_types) and not coarse:
            # the Chebyshev recurrence tolerates a bf16-grade operator (the
            # residuals and CG stay on the exact banded kernel) — verified
            # to preserve convergence counts in tests/test_pallas_smoother.py
            # (coarse levels never smooth fused, so skip the MXU setup there).
            # In 2D the one banded operator serves every role, so the "mxu"
            # request returns the same kernel (ops/pallas_laplace2d.py).
            smoother_op = make_laplace_auto(space, dtype, core="mxu")
            if not isinstance(smoother_op, pallas_types):
                smoother_op = None
    else:
        op = make_laplace(space, dtype, variant=variant)
    fused = smoother_op if smoother_op is not None and not coarse else None
    if coarse:
        smoother = make_chebyshev(
            op,
            smoothing_range=1e-3,
            degree=None,
            eig_cg_n_iterations=space.n_dofs,
        )
    else:
        resid3 = None
        cheb2 = None
        cheb2r = None
        if fused is not None:
            from ..ops.pallas_laplace import make_resid3_twin

            resid3 = make_resid3_twin(space, op, dtype)
            if os.environ.get("PMG_CHEB2", "1") == "1":
                # two-step fused recurrence pairs (ops/pallas_cheb2.py):
                # one HBM pass per pair of Chebyshev steps; CG-count parity
                # pinned in tests/test_pallas_cheb2.py
                from ..ops.pallas_cheb2 import make_cheb2_auto

                cheb2 = make_cheb2_auto(space, dtype)
                if cheb2 is not None and os.environ.get(
                        "PMG_CHEB2R", "0") == "1":
                    # OPT-IN S=3 "pair + r_out": the pre-restriction
                    # residual rides the last pre-smooth pair (one full
                    # residual1t HBM pass disappears), but the residual is
                    # then recurrence-grade — accumulated bf16-A errors
                    # (~0.3 %/pair at residual scale) cost ONE extra CG
                    # iteration at production grade (measured,
                    # tests/test_pallas_cheb2.py::
                    # test_cheb2lr_costs_at_most_one_iteration), so the
                    # default stays on the exact banded residual
                    cheb2r = make_cheb2_auto(space, dtype, rout=True)
        smoother = make_chebyshev(
            op, smoothing_range=15.0, degree=5, eig_cg_n_iterations=10,
            fused_smoother_op=fused,
            # fused levels run the trimmed kernel-chained pipeline (state
            # pads/trims only at representation boundaries — wire_trimmed)
            # with the recurrence r/d streams stored bf16 (halves the
            # dominant smoother HBM traffic; CG-count parity pinned in
            # tests/test_pallas_smoother.py)
            trimmed_io=fused is not None,
            resid3_op=resid3,
            state_dtype="bf16" if fused is not None else "f32",
            cheb2_op=cheb2,
            cheb2r_op=cheb2r,
        )
    return op, smoother


@partial(jax.jit, static_argnames=("rtol",))
def _solve(fine_op, mg: VCycle, rhs, rtol: float) -> CGResult:
    return cg(fine_op.apply, rhs, mg.apply, rtol=rtol)


class _MultigridPoissonBase:
    """Common machinery: build levels, solve, report."""

    def __init__(self, dtype=jnp.float64, variant: str = "sumfac",
                 coefficient=None):
        self.dtype = dtype
        self.variant = variant
        self.coefficient = coefficient
        self.levels: tuple[MGLevel, ...] = ()
        self.spaces: list[FESpace] = []

    def _assemble_levels(self, spaces, make_transfer):
        levels = []
        prev_trimmed = False
        for i, sp in enumerate(spaces):
            op, smoother = _build_level(
                sp, self.dtype, coarse=(i == 0), variant=self.variant,
                coefficient=self.coefficient,
            )
            cur_trimmed = bool(getattr(smoother, "trimmed_io", False))
            transfer = None
            if i > 0:
                if cur_trimmed and make_transfer is make_h_transfer:
                    # trimmed pallas level: fused pallas transfer kernels
                    # where the pair is eligible
                    from ..ops.pallas_transfer import make_h_transfer_auto

                    transfer = make_h_transfer_auto(
                        spaces[i - 1], sp, self.dtype, cur_trimmed,
                        prev_trimmed,
                    )
                else:
                    transfer = make_transfer(spaces[i - 1], sp, self.dtype)
            prev_trimmed = cur_trimmed
            levels.append(MGLevel(op=op, smoother=smoother, transfer=transfer))
        from ..solvers.vcycle import wire_trimmed

        levels, self.fine_trimmed = wire_trimmed(levels)
        self.spaces = list(spaces)
        self.levels = tuple(levels)

    def solve(
        self,
        rtol: float = 1e-12,
        pre_smoothing_steps: int = 2,
        post_smoothing_steps: int = 2,
        verbose: bool = False,
        f=None,
    ) -> tuple[jnp.ndarray, SolveStats]:
        """Solve -Δu = f (f ≡ 1 when None, like the reference driver)."""
        fine = self.spaces[-1]
        rhs = jnp.asarray(assemble_rhs(fine, f=f), self.dtype)
        mg = VCycle(
            pre_smoothing_steps=pre_smoothing_steps,
            post_smoothing_steps=post_smoothing_steps,
            fine_trimmed=bool(getattr(self, "fine_trimmed", False)),
            levels=self.levels,
        )
        result = _solve(self.levels[-1].op, mg, rhs, rtol)
        x = np.asarray(result.x, dtype=np.float64)
        stats = SolveStats(
            iterations=int(result.iterations),
            residual_norm=float(result.residual_norm),
            converged=bool(result.converged),
            solution_l2_norm=l2_norm(fine, x),
            n_dofs=fine.n_dofs,
            dofs_per_level=[sp.n_dofs for sp in self.spaces],
        )
        if verbose:
            print(
                f" Number of degrees of freedom: {stats.n_dofs} "
                f"(by level: {', '.join(str(d) for d in stats.dofs_per_level)})"
            )
            print(f"  Solver converged in {stats.iterations} iterations.")
            print(f"  solution norm: {stats.solution_l2_norm:.6g}")
        return result.x, stats


class GeometricMultigridPoisson(_MultigridPoissonBase):
    """h-multigrid Poisson solve (reference: source/geometric_multigrid/program.cc).

    ``refinements`` is the finest level; the hierarchy is the full geometric
    coarsening sequence down to the 1-cell base mesh.
    """

    def __init__(
        self,
        dim: int,
        degree: int,
        refinements: int,
        dtype=jnp.float64,
        variant: str = "sumfac",
        coefficient=None,
    ):
        super().__init__(dtype, variant, coefficient)
        mesh = HyperCubeMesh(dim, refinements)
        meshes = geometric_coarsening_sequence(mesh)
        spaces = [FESpace(m, degree) for m in meshes]
        self._assemble_levels(spaces, make_h_transfer)


class PolynomialMultigridPoisson(_MultigridPoissonBase):
    """p-multigrid Poisson solve (reference: source/polynomial_multigrid/program.cc).

    One mesh; degrees p_l = degree - (n_levels-1-l)
    (reference: source/polynomial_multigrid/program.cc:149-159).
    """

    def __init__(
        self,
        dim: int,
        degree: int,
        refinements: int,
        n_levels: int | None = None,
        dtype=jnp.float64,
        variant: str = "sumfac",
    ):
        super().__init__(dtype, variant)
        if n_levels is None:
            n_levels = degree
        if n_levels > degree:
            raise ValueError("n_levels must be <= degree")
        mesh = HyperCubeMesh(dim, refinements)
        degrees = [degree - (n_levels - 1 - l) for l in range(n_levels)]
        spaces = [FESpace(mesh, p) for p in degrees]
        self._assemble_levels(spaces, make_p_transfer)
