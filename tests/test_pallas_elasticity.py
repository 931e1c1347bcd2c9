"""Banded Pallas vector elasticity kernel: interpret-mode parity tests.

The kernel computes all 21 Kronecker chains of the elasticity weak form
(reference: include/operators/portable_laplace_operator.h:300-325 generalized
to the gradient tensor) — cross-checked here against the assembled-Kronecker
XLA operator (itself pinned to the dense element-matrix assembly in
tests/test_elasticity.py) and the assembled diagonal."""

import numpy as np
import pytest
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.elasticity import (
    _elasticity_diagonal,
    make_elasticity,
)
from portable_multigrid_tpu.ops.pallas_elasticity import (
    make_pallas_elasticity,
)


@pytest.mark.parametrize(
    "p,n,bx,by,zpad",
    [
        (2, 4, 4, 4, 0),  # single block
        (2, 8, 4, 4, 0),  # 2x2 block grid: carry-plane overlap-add
        (2, 4, 4, 4, 4),  # lane-padded (zpad) kernel state
        (3, 8, 8, 8, 0),  # production degree (Q3 = BASELINE config 4)
    ],
)
def test_pallas_elasticity_matches_kron(p, n, bx, by, zpad):
    sp = FESpace(HyperCubeMesh(3, int(np.log2(n))), p)
    mu, lam = 0.7, 1.3
    ref = make_elasticity(sp, jnp.float64, mu=mu, lam=lam, variant="kron")
    op = make_pallas_elasticity(
        sp, jnp.float64, mu=mu, lam=lam, bx=bx, by=by, interpret=True,
        zpad=zpad,
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(ref.shape))
    a_ref = np.asarray(ref.apply(u))
    a_pal = np.asarray(op.apply(u))
    scale = np.max(np.abs(a_ref))
    assert np.max(np.abs(a_ref - a_pal)) / scale < 1e-12


def test_pallas_elasticity_inv_diag_matches_assembled():
    sp = FESpace(HyperCubeMesh(3, 2), 2)
    mu, lam = 0.7, 1.3
    op = make_pallas_elasticity(
        sp, jnp.float64, mu=mu, lam=lam, bx=4, by=4, interpret=True, zpad=0
    )
    dref = 1.0 / _elasticity_diagonal(sp, mu, lam)
    got = np.asarray(op.inv_diag)
    assert np.max(np.abs(dref - got)) / np.max(np.abs(dref)) < 1e-12


def test_pallas_elasticity_mxu_core_is_bf16_grade():
    sp = FESpace(HyperCubeMesh(3, 2), 2)
    mu, lam = 0.7, 1.3
    ref = make_elasticity(sp, jnp.float64, mu=mu, lam=lam, variant="kron")
    op = make_pallas_elasticity(
        sp, jnp.float64, mu=mu, lam=lam, bx=4, by=4, interpret=True, zpad=0,
        core="mxu",
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(ref.shape))
    a_ref = np.asarray(ref.apply(u))
    a_mxu = np.asarray(op.apply(u))
    err = np.max(np.abs(a_ref - a_mxu)) / np.max(np.abs(a_ref))
    assert err < 2e-2  # bf16-rounded inputs, f32 accumulation


def test_mxu_recurrence_preserves_cg_counts():
    """Full CG+MG solve with the fine level on the banded pallas operator
    and the Chebyshev RECURRENCE on the mxu core: iteration count equals
    the all-kron reference exactly (the scalar-operator smoother-split
    invariant, CLAUDE.md)."""
    import dataclasses

    from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid
    from portable_multigrid_tpu.solvers.vcycle import MGLevel

    ref_model = ElasticityMultigrid(3, 2, 2, dtype=jnp.float64,
                                    variant="kron")
    _, ref_stats = ref_model.solve()

    m2 = ElasticityMultigrid(3, 2, 2, dtype=jnp.float64, variant="kron")
    sp = m2.spaces[-1]
    pal = make_pallas_elasticity(sp, jnp.float64, bx=4, by=4, interpret=True,
                                 zpad=0)
    mxu = make_pallas_elasticity(sp, jnp.float64, bx=4, by=4, interpret=True,
                                 zpad=0, core="mxu")
    lv = m2.levels[-1]
    sm = dataclasses.replace(lv.smoother, op=mxu)
    m2.levels = m2.levels[:-1] + (
        MGLevel(op=pal, smoother=sm, transfer=lv.transfer),
    )
    _, stats = m2.solve()
    assert stats.converged
    assert stats.iterations == ref_stats.iterations


def test_pallas_elasticity_smoother_parity():
    """A Chebyshev smoother driven by the pallas operator matches the kron
    one exactly (same apply, same inv_diag => identical recurrence)."""
    from portable_multigrid_tpu.solvers.chebyshev import make_chebyshev

    sp = FESpace(HyperCubeMesh(3, 2), 2)
    ref = make_elasticity(sp, jnp.float64, mu=1.0, lam=1.0, variant="kron")
    op = make_pallas_elasticity(
        sp, jnp.float64, mu=1.0, lam=1.0, bx=4, by=4, interpret=True, zpad=0
    )
    fm = np.broadcast_to(sp.free_mask()[None], (3,) + sp.grid_shape)
    sm_ref = make_chebyshev(ref, smoothing_range=15.0, degree=5,
                            eig_cg_n_iterations=10, free_mask=fm)
    sm_pal = make_chebyshev(op, smoothing_range=15.0, degree=5,
                            eig_cg_n_iterations=10, free_mask=fm)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(ref.shape) * np.asarray(fm))
    x_ref = np.asarray(sm_ref.apply(b))
    x_pal = np.asarray(sm_pal.apply(b))
    assert np.max(np.abs(x_ref - x_pal)) / np.max(np.abs(x_ref)) < 1e-10


@pytest.mark.parametrize("n,zpad", [(8, 0), (4, 4)])
def test_fused_vector_chebyshev_matches_plain(n, zpad):
    """FusedVectorChebyshev (kernel-fused vector recurrence on trimmed
    3-component state — modes residual/residual1/cheb/chebl) equals the
    plain Chebyshev smoother on masked inputs to f32-coefficient roundoff
    (the recurrence scalars ride SMEM as f32, the scalar-kernel precedent:
    tests/test_pallas_smoother.py::test_fused_chebyshev_matches_plain)."""
    from portable_multigrid_tpu.solvers.chebyshev import (
        Chebyshev,
        FusedVectorChebyshev,
    )

    sp = FESpace(HyperCubeMesh(3, int(np.log2(n))), 2)
    mu, lam = 0.7, 1.3
    op = make_pallas_elasticity(
        sp, jnp.float64, mu=mu, lam=lam, bx=4, by=4, interpret=True,
        zpad=zpad,
    )
    theta = jnp.asarray(1.3, jnp.float64)
    delta = jnp.asarray(0.9, jnp.float64)
    plain = Chebyshev(degree=5, op=op, inv_diag=None, theta=theta,
                      delta=delta)
    fused = FusedVectorChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                                 delta=delta)
    rng = np.random.default_rng(0)
    fm = np.broadcast_to(sp.free_mask()[None], op.shape)
    b = jnp.asarray(rng.standard_normal(op.shape) * fm)
    u = jnp.asarray(rng.standard_normal(op.shape) * fm)

    za, zb = np.asarray(plain.apply(b)), np.asarray(fused.apply(b))
    assert np.abs(za - zb).max() <= 5e-6 * np.abs(za).max()
    sa = np.asarray(u + plain.apply(b - op.apply(u)))
    sb = np.asarray(fused.smooth(u, b))
    assert np.abs(sa - sb).max() <= 5e-6 * np.abs(sa).max()
    ra = np.asarray((b - op.apply(u)) * fm)
    rb = np.asarray(fused.residual(u, b))
    assert np.abs(ra - rb).max() <= 5e-6 * np.abs(ra).max()


@pytest.mark.parametrize("degree", [1, 2])
def test_fused_vector_chebyshev_low_degree(degree):
    """Degree-1 (damped Jacobi, pure XLA diagonal path) and degree-2 (one
    fused chebl step) edge cases of the vector fused smoother."""
    from portable_multigrid_tpu.solvers.chebyshev import (
        Chebyshev,
        FusedVectorChebyshev,
    )

    sp = FESpace(HyperCubeMesh(3, 2), 2)
    op = make_pallas_elasticity(
        sp, jnp.float64, mu=0.7, lam=1.3, bx=4, by=4, interpret=True, zpad=0
    )
    theta = jnp.asarray(1.1, jnp.float64)
    delta = jnp.asarray(0.8, jnp.float64)
    plain = Chebyshev(degree=degree, op=op, inv_diag=None, theta=theta,
                      delta=delta)
    fused = FusedVectorChebyshev(degree=degree, op=op, theta=theta,
                                 delta=delta)
    rng = np.random.default_rng(3)
    fm = np.broadcast_to(sp.free_mask()[None], op.shape)
    b = jnp.asarray(rng.standard_normal(op.shape) * fm)
    u = jnp.asarray(rng.standard_normal(op.shape) * fm)
    za, zb = np.asarray(plain.apply(b)), np.asarray(fused.apply(b))
    assert np.abs(za - zb).max() <= 5e-6 * np.abs(za).max()
    sa = np.asarray(u + plain.apply(b - op.apply(u)))
    sb = np.asarray(fused.smooth(u, b))
    assert np.abs(sa - sb).max() <= 5e-6 * np.abs(sa).max()


def test_fused_vector_vcycle_preserves_convergence_counts():
    """Full elasticity multigrid solve with the finest level running the
    FUSED vector smoother (banded residuals + mxu-core recurrence, all
    epilogues in-kernel) reproduces the kron model's CG count and L2 norm
    — the model-wiring twin of the scalar
    test_fused_vcycle_preserves_convergence_counts."""
    import dataclasses

    from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid
    from portable_multigrid_tpu.solvers.vcycle import MGLevel
    from portable_multigrid_tpu.solvers.chebyshev import FusedVectorChebyshev

    ref_model = ElasticityMultigrid(3, 2, 2, dtype=jnp.float64,
                                    variant="kron")
    _, ref_stats = ref_model.solve()

    m2 = ElasticityMultigrid(3, 2, 2, dtype=jnp.float64, variant="kron")
    sp = m2.spaces[-1]
    pal = make_pallas_elasticity(sp, jnp.float64, bx=4, by=4, interpret=True,
                                 zpad=0)
    mxu = make_pallas_elasticity(sp, jnp.float64, bx=4, by=4, interpret=True,
                                 zpad=0, core="mxu")
    lv = m2.levels[-1]
    sm = FusedVectorChebyshev(degree=lv.smoother.degree, op=pal,
                              op_smooth=mxu, theta=lv.smoother.theta,
                              delta=lv.smoother.delta)
    m2.levels = m2.levels[:-1] + (
        MGLevel(op=pal, smoother=sm, transfer=lv.transfer),
    )
    _, stats = m2.solve()
    assert stats.converged
    assert stats.iterations == ref_stats.iterations
    assert stats.solution_l2_norm == pytest.approx(
        ref_stats.solution_l2_norm, rel=1e-7
    )
