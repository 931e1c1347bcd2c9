"""2D fused Pallas kernel family (ops/pallas_laplace2d.py), interpret mode.

The reference's second driver (2D polynomial multigrid,
source/polynomial_multigrid/program.cc:434-459) runs this family on TPU;
these tests pin, on CPU interpret mode (which reproduces kernel logic
exactly — CLAUDE.md):

  * operator parity vs the assembled-Kronecker XLA variant (incl. lane
    padding and multi-block carries);
  * FusedChebyshev parity on the full fused-mode surface (apply / smooth /
    residual ride modes residual3t / residual1t / cheb / chebl / chebd /
    chebdl);
  * end-to-end CG-count parity: the 2D polynomial AND geometric drivers
    with fused-2D levels reproduce the pure-XLA convergence history
    (mixed hierarchies — some levels fused, some XLA — exercise the
    representation boundaries in wire_trimmed).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.laplace import make_laplace
from portable_multigrid_tpu.ops import pallas_laplace2d
from portable_multigrid_tpu.ops.pallas_laplace2d import (
    PallasLaplace2D,
    make_pallas_laplace2d,
    pallas2d_eligible,
)
from portable_multigrid_tpu.solvers.chebyshev import Chebyshev, FusedChebyshev


@pytest.mark.parametrize(
    "refinements,p,bx,zpad",
    [(3, 2, 4, None), (3, 3, 8, None), (3, 4, 2, None), (2, 2, 4, 8)],
)
def test_apply_matches_kron(refinements, p, bx, zpad):
    sp = FESpace(HyperCubeMesh(2, refinements), p)
    op = make_pallas_laplace2d(sp, jnp.float32, bx=bx, interpret=True,
                               zpad=zpad)
    ref = make_laplace(sp, jnp.float32, variant="kron")
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape), jnp.float32)
    a = np.asarray(op.apply(u))
    b = np.asarray(ref.apply(u))
    assert np.max(np.abs(a - b)) < 1e-5 * np.max(np.abs(b))


def _fused_pair(sp, op):
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    plain = Chebyshev(degree=5, op=op, inv_diag=None, theta=theta,
                      delta=delta)
    fused = FusedChebyshev(degree=5, op=op, op_smooth=op, trimmed_io=True,
                           theta=theta, delta=delta)
    return plain, fused


@pytest.mark.parametrize("sdtype", ["f32", "bf16"])
def test_fused_chebyshev_matches_plain_2d(sdtype):
    sp = FESpace(HyperCubeMesh(2, 3), 2)
    op = make_pallas_laplace2d(sp, jnp.float32, bx=4, interpret=True)
    plain, fused = _fused_pair(sp, op)
    fused = FusedChebyshev(
        degree=5, op=op, op_smooth=op, trimmed_io=True,
        state_dtype=sdtype, theta=fused.theta, delta=fused.delta,
    )
    rng = np.random.default_rng(1)
    m = np.asarray(op.mask)
    b = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    tol = 2e-6 if sdtype == "f32" else 3e-2  # bf16 recurrence-state rounding

    xa = np.asarray(plain.apply(b))
    xb = np.asarray(fused._pad_full(fused.apply(fused._trim(b))))
    assert np.max(np.abs(xa - xb)) < tol * np.max(np.abs(xa))

    sa = np.asarray(u + plain.apply(b - op.apply(u)))
    sb = np.asarray(
        fused._pad_full(fused.smooth(fused._trim(u), fused._trim(b)))
    )
    assert np.max(np.abs(sa - sb)) < tol * np.max(np.abs(sa))

    ra = np.asarray(b - op.apply(u))
    rb = np.asarray(
        fused._pad_full(fused.residual(fused._trim(u), fused._trim(b)))
    )
    # the residual path is exact-kernel regardless of state_dtype
    assert np.max(np.abs(ra - rb)) < 2e-6 * np.max(np.abs(ra))


def test_eligibility_gate():
    sp = FESpace(HyperCubeMesh(2, 5), 4)  # 32 cells * p4 = 128 lanes
    assert pallas2d_eligible(sp, bx=2)
    assert pallas2d_eligible(sp, bx=16)
    assert not pallas2d_eligible(sp, bx=3)  # 3*4 % 8 != 0
    sp3 = FESpace(HyperCubeMesh(3, 5), 4)
    assert not pallas2d_eligible(sp3)  # dim gate
    small = FESpace(HyperCubeMesh(2, 3), 4)  # 32 lanes < 128
    assert not pallas2d_eligible(small, bx=2)
    assert pallas2d_eligible(small, bx=2, zpad=96)  # explicit pad-up


def _patch_auto_2d(monkeypatch):
    """Route make_laplace_auto's 2D branch onto interpret-mode kernels for
    the block shapes the tiny CPU grids allow (levels whose (n, p) cannot
    satisfy bx*p % 8 == 0 fall back to XLA — a MIXED hierarchy)."""

    def fake_candidate(space, dtype):
        if dtype != jnp.float32:
            return None
        n, p = space.mesh.cells_per_axis, space.degree
        for bx in (8, 4, 2):
            if n % bx == 0 and (bx * p) % 8 == 0:
                return make_pallas_laplace2d(space, dtype, bx=bx,
                                             interpret=True)
        return None

    monkeypatch.setattr(
        pallas_laplace2d, "make_laplace2d_candidate", fake_candidate
    )


def test_polynomial_2d_auto_counts(monkeypatch):
    """2D p-ladder with fused-2D levels reproduces the pure-XLA convergence
    history (iterations exactly, L2 norm to f32 grade).  Kept at r=2: CPU
    compiles of interpret-kernel CG programs blow up at r>=3 (the at-scale
    counts are pinned on the real chip, experiments/r5_batch3.py)."""
    from portable_multigrid_tpu.models.poisson import (
        PolynomialMultigridPoisson,
    )

    base = PolynomialMultigridPoisson(2, 4, 2, dtype=jnp.float32,
                                      variant="sumfac")
    _, st0 = base.solve(rtol=1e-5)

    _patch_auto_2d(monkeypatch)
    prob = PolynomialMultigridPoisson(2, 4, 2, dtype=jnp.float32,
                                      variant="auto")
    assert any(
        isinstance(lvl.op, PallasLaplace2D) for lvl in prob.levels
    ), "no level took the 2D pallas path"
    _, st1 = prob.solve(rtol=1e-5)

    assert st1.converged
    assert st1.iterations == st0.iterations
    assert st1.solution_l2_norm == pytest.approx(
        st0.solution_l2_norm, rel=1e-5
    )


def test_geometric_2d_auto_counts(monkeypatch):
    from portable_multigrid_tpu.models.poisson import (
        GeometricMultigridPoisson,
    )

    base = GeometricMultigridPoisson(2, 2, 2, dtype=jnp.float32,
                                     variant="sumfac")
    _, st0 = base.solve(rtol=1e-5)

    _patch_auto_2d(monkeypatch)
    prob = GeometricMultigridPoisson(2, 2, 2, dtype=jnp.float32,
                                     variant="auto")
    assert any(
        isinstance(lvl.op, PallasLaplace2D) for lvl in prob.levels
    ), "no level took the 2D pallas path"
    _, st1 = prob.solve(rtol=1e-5)

    assert st1.converged
    assert st1.iterations == st0.iterations
    assert st1.solution_l2_norm == pytest.approx(
        st0.solution_l2_norm, rel=1e-5
    )
