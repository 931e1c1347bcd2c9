"""bf16 MXU smoother core: convergence-count preservation (interpret mode).

The production V-cycle uses two Pallas kernel engines per fine level: the
exact f32 banded core for level residuals and the outer CG, and the bf16
MXU core ("mxu") ONLY inside the Chebyshev recurrence.  A bf16-grade
operator everywhere in the V-cycle roughly doubles CG iterations (measured
5 -> 11 on 3D Q4 r=3); restricted to the smoother interior it leaves the
convergence history exactly unchanged.  This test pins that property.

Interpret mode reproduces the bf16 rounding bit-for-bit on CPU (the casts
are explicit in the kernel).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from portable_multigrid_tpu.models.mixed import MixedPrecisionPoisson
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.solvers.chebyshev import Chebyshev
from portable_multigrid_tpu.solvers.vcycle import MGLevel


@pytest.fixture(scope="module")
def base_stats():
    """One shared baseline f32-V-cycle solve (3D Q4 r=2) for all count
    tests — interpret-mode solves are expensive on the 1-core CI host."""
    _, st = MixedPrecisionPoisson(3, 4, 2, mg_dtype=jnp.float32).solve()
    return st


def _swap_fine_smoother(prob, core):
    mxu = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True, core=core
    )
    lv = list(prob.levels)
    l = lv[-1]
    sm = Chebyshev(
        degree=l.smoother.degree,
        op=mxu,
        inv_diag=None,
        theta=l.smoother.theta,
        delta=l.smoother.delta,
    )
    lv[-1] = MGLevel(op=l.op, smoother=sm, transfer=l.transfer)
    prob.levels = tuple(lv)


@pytest.mark.parametrize("core", ["mxu", "mxu3"])
def test_mxu_smoother_preserves_convergence_counts(core, base_stats):
    dim, p, r = 3, 4, 2
    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    _swap_fine_smoother(prob, core)
    _, st = prob.solve()

    assert st.converged
    assert st.iterations == base_stats.iterations
    assert st.solution_l2_norm == pytest.approx(
        base_stats.solution_l2_norm, rel=1e-10
    )


def test_fused_chebyshev_matches_plain():
    """FusedChebyshev (kernel-fused recurrence on trimmed state) equals the
    plain Chebyshev smoother on masked inputs to f32 roundoff."""
    from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev

    sp = FESpace(HyperCubeMesh(3, 3), 4)
    op = make_pallas_laplace(
        sp, jnp.float32, bx=4, by=4, interpret=True, core="banded"
    )
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    plain = Chebyshev(degree=5, op=op, inv_diag=None, theta=theta, delta=delta)
    fused = FusedChebyshev(
        degree=5, op=op, op_smooth=op, theta=theta, delta=delta
    )
    rng = np.random.default_rng(0)
    m = np.asarray(op.mask)
    b = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    za, zb = np.asarray(plain.apply(b)), np.asarray(fused.apply(b))
    assert np.abs(za - zb).max() <= 5e-6 * np.abs(za).max()
    sa = np.asarray(u + plain.apply(b - op.apply(u)))
    sb = np.asarray(fused.smooth(u, b))
    assert np.abs(sa - sb).max() <= 5e-6 * np.abs(sa).max()
    ra = np.asarray((b - op.apply(u)) * op.mask)
    rb = np.asarray(fused.residual(u, b))
    assert np.abs(ra - rb).max() <= 5e-6 * np.abs(ra).max()


def test_trimmed_io_matches_full():
    """trimmed_io=True (the kernel-chained trimmed pipeline: residual3t
    seeding x0 = u + d0, residual1t, no pad/trim passes) computes the SAME
    smoother algebra as the full-grid fused path to f32 roundoff."""
    from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev

    sp = FESpace(HyperCubeMesh(3, 3), 4)
    op = make_pallas_laplace(
        sp, jnp.float32, bx=4, by=4, interpret=True, core="banded"
    )
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    full = FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                          delta=delta)
    trim = FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                          delta=delta, trimmed_io=True)
    rng = np.random.default_rng(1)
    m = np.asarray(op.mask)
    b = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    tt = lambda a: jnp.asarray(np.asarray(a)[:-1, :-1, :-1])

    za = np.asarray(full.apply(b))
    zb = np.asarray(trim.apply(tt(b)))
    assert np.abs(za[:-1, :-1, :-1] - zb).max() <= 5e-6 * np.abs(za).max()
    sa = np.asarray(full.smooth(u, b))
    sb = np.asarray(trim.smooth(tt(u), tt(b)))
    assert np.abs(sa[:-1, :-1, :-1] - sb).max() <= 5e-6 * np.abs(sa).max()
    ra = np.asarray(full.residual(u, b))
    rb = np.asarray(trim.residual(tt(u), tt(b)))
    assert np.abs(ra[:-1, :-1, :-1] - rb).max() <= 5e-6 * np.abs(ra).max()


def test_trimmed_vcycle_matches_full(base_stats):
    """wire_trimmed + fine_trimmed V-cycle preserves the CG history of the
    full-representation fused V-cycle (the production r>=3 composition)."""
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev
    from portable_multigrid_tpu.solvers.vcycle import VCycle, wire_trimmed

    dim, p, r = 3, 4, 2
    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    exact = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True
    )
    mxu = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True, core="mxu"
    )
    lv = list(prob.levels)
    l = lv[-1]
    sm = FusedChebyshev(
        degree=l.smoother.degree, op=exact, op_smooth=mxu,
        theta=l.smoother.theta, delta=l.smoother.delta, trimmed_io=True,
    )
    lv[-1] = MGLevel(op=exact, smoother=sm, transfer=l.transfer)
    wired, fine_trim = wire_trimmed(lv)
    assert fine_trim
    prob.levels = tuple(wired)
    prob.fine_trimmed = True
    _, st = prob.solve()
    assert st.converged
    assert st.iterations == base_stats.iterations
    assert st.solution_l2_norm == pytest.approx(
        base_stats.solution_l2_norm, rel=1e-9
    )


@pytest.mark.parametrize("residual_core", ["banded", "hyb3"])
def test_fused_vcycle_preserves_convergence_counts(residual_core, base_stats):
    """The production configuration: exact (banded or hi/lo-hybrid)
    residuals + fully fused bf16 MXU Chebyshev recurrence — CG history
    unchanged."""
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev

    dim, p, r = 3, 4, 2
    st_base = base_stats
    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    exact = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True,
        core=residual_core,
    )
    mxu = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True, core="mxu"
    )
    lv = list(prob.levels)
    l = lv[-1]
    sm = FusedChebyshev(
        degree=l.smoother.degree, op=exact, op_smooth=mxu,
        theta=l.smoother.theta, delta=l.smoother.delta,
    )
    lv[-1] = MGLevel(op=exact, smoother=sm, transfer=l.transfer)
    prob.levels = tuple(lv)
    _, st = prob.solve()
    assert st.converged
    assert st.iterations == st_base.iterations
    assert st.solution_l2_norm == pytest.approx(
        st_base.solution_l2_norm, rel=1e-9
    )


def test_mxu3_core_is_f32_faithful():
    """hi/lo-split MXU core matches the exact operator to ~1e-6 relative."""
    from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
    from portable_multigrid_tpu.fem.space import FESpace
    from portable_multigrid_tpu.ops.laplace import make_laplace

    sp = FESpace(HyperCubeMesh(3, 3), 4)
    ref = make_laplace(sp, jnp.float32, variant="kron")
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape), jnp.float32)
    want = np.asarray(ref.apply(u))
    op = make_pallas_laplace(
        sp, jnp.float32, bx=4, by=4, interpret=True, core="mxu3"
    )
    got = np.asarray(op.apply(u))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-6, err


def test_bf16_state_smoother_preserves_convergence_counts(base_stats):
    """state_dtype="bf16" (recurrence r/d streams stored bfloat16, the
    round-3 HBM-traffic lever) preserves the CG history: the rounded
    streams are recurrence-state-scale only — every level residual and the
    x accumulator stay f32 (kernel-side invariant, ops/pallas_laplace.py
    out_dtypes)."""
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev
    from portable_multigrid_tpu.solvers.vcycle import wire_trimmed

    dim, p, r = 3, 4, 2
    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    exact = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True
    )
    mxu = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True, core="mxu"
    )
    lv = list(prob.levels)
    l = lv[-1]
    sm = FusedChebyshev(
        degree=l.smoother.degree, op=exact, op_smooth=mxu,
        theta=l.smoother.theta, delta=l.smoother.delta, trimmed_io=True,
        state_dtype="bf16",
    )
    lv[-1] = MGLevel(op=exact, smoother=sm, transfer=l.transfer)
    wired, fine_trim = wire_trimmed(lv)
    assert fine_trim
    prob.levels = tuple(wired)
    prob.fine_trimmed = True
    _, st = prob.solve()
    assert st.converged
    assert st.iterations == base_stats.iterations
    assert st.solution_l2_norm == pytest.approx(
        base_stats.solution_l2_norm, rel=1e-7
    )
