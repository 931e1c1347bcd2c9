"""Two-step fused Chebyshev kernel (ops/pallas_cheb2.py), interpret mode.

Equivalence ladder:
  1. exact-mode kernel (f32 matrices, no bf16 rounding) == the single-step
     fused smoother to f32 roundoff, for apply() (x0 = 0, chebd2 entry) and
     smooth() (residual3t entry) across block/edge configurations;
  2. the production bf16 pair kernel preserves CG convergence counts in a
     full mixed-precision solve (the same bar the single-step bf16 core and
     bf16 state streams had to clear, tests/test_pallas_smoother.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.models.mixed import MixedPrecisionPoisson
from portable_multigrid_tpu.ops.pallas_cheb2 import make_cheb2
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev
from portable_multigrid_tpu.solvers.vcycle import MGLevel, wire_trimmed


def _masked_state(sp, op, seed):
    rng = np.random.default_rng(seed)
    m = np.asarray(op.mask)
    b = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    tt = lambda a: jnp.asarray(np.asarray(a)[:-1, :-1, :-1])
    return tt(b), tt(u)


@pytest.mark.parametrize(
    "p,n,b,deg",
    [
        (2, 8, 4, 5),   # 2x2 blocks: every block is an edge block
        (2, 16, 4, 5),  # 4x4 blocks: interior windows + both edges
        (4, 4, 2, 5),   # production degree, bxp == 2p (minimum halo fit)
        (2, 8, 4, 4),   # odd step count: one pair + a single trailing step
        (2, 8, 8, 5),   # single block per axis (nbi == nbj == 1)
    ],
)
def test_cheb2_pairs_match_single_steps(p, n, b, deg):
    sp = FESpace(HyperCubeMesh(3, int(np.log2(n))), p)
    assert sp.mesh.cells_per_axis == n
    op = make_pallas_laplace(sp, jnp.float32, bx=b, by=b, interpret=True)
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    base = FusedChebyshev(degree=deg, op=op, op_smooth=op, theta=theta,
                          delta=delta, trimmed_io=True)
    k2 = make_cheb2(sp, jnp.float32, bx=b, by=b, interpret=True, exact=True)
    paired = FusedChebyshev(degree=deg, op=op, op_smooth=op, theta=theta,
                            delta=delta, trimmed_io=True, op_cheb2=k2)
    bt, ut = _masked_state(sp, op, 0)

    za, zb = np.asarray(base.apply(bt)), np.asarray(paired.apply(bt))
    assert np.abs(za - zb).max() <= 2e-5 * np.abs(za).max()
    sa = np.asarray(base.smooth(ut, bt))
    sb = np.asarray(paired.smooth(ut, bt))
    assert np.abs(sa - sb).max() <= 2e-5 * np.abs(sa).max()


def test_cheb2_pairs_match_with_zpad():
    """Lane-padded state (Q5/Q7-style zpad): pad lanes stay identically
    zero through the pair kernel and results match the single-step path."""
    p, n, b, zp = 4, 4, 2, 4
    sp = FESpace(HyperCubeMesh(3, 2), p)
    op = make_pallas_laplace(sp, jnp.float32, bx=b, by=b, interpret=True,
                             zpad=zp)
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    base = FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                          delta=delta, trimmed_io=True)
    k2 = make_cheb2(sp, jnp.float32, bx=b, by=b, zpad=zp, interpret=True,
                    exact=True)
    paired = FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                            delta=delta, trimmed_io=True, op_cheb2=k2)
    bt, ut = _masked_state(sp, op, 3)
    zpad3 = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, zp)))
    bt, ut = zpad3(bt), zpad3(ut)
    sa = np.asarray(base.smooth(ut, bt))
    sb = np.asarray(paired.smooth(ut, bt))
    assert np.abs(sa - sb).max() <= 2e-5 * np.abs(sa).max()
    assert np.abs(sb[:, :, -zp:]).max() == 0.0


def test_cheb2_bf16_state_roundtrip():
    """bf16 r/d streams through the pair kernel: outputs stay finite and
    close to the f32-stream pair (stream rounding only — in-VMEM math is
    f32 in both)."""
    sp = FESpace(HyperCubeMesh(3, 3), 2)
    op = make_pallas_laplace(sp, jnp.float32, bx=4, by=4, interpret=True)
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    k2 = make_cheb2(sp, jnp.float32, bx=4, by=4, interpret=True, exact=True)
    f32p = FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                          delta=delta, trimmed_io=True, op_cheb2=k2)
    bf = FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                        delta=delta, trimmed_io=True, op_cheb2=k2,
                        state_dtype="bf16")
    bt, ut = _masked_state(sp, op, 2)
    sa = np.asarray(f32p.smooth(ut, bt))
    sb = np.asarray(bf.smooth(ut, bt))
    assert np.isfinite(sb).all()
    assert np.abs(sa - sb).max() <= 3e-2 * np.abs(sa).max()


def test_cheb2_smoother_preserves_convergence_counts():
    """Production grade (bf16 matrices + bf16 state streams) pair kernel in
    the fine-level smoother: CG history of the mixed-precision solve is
    unchanged."""
    dim, p, r = 3, 4, 2
    base = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    _, st_base = base.solve()

    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    exact = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True
    )
    mxu = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True, core="mxu"
    )
    k2 = make_cheb2(prob.spaces[-1], jnp.float32, bx=4, by=4,
                    interpret=True)
    lv = list(prob.levels)
    l = lv[-1]
    sm = FusedChebyshev(
        degree=l.smoother.degree, op=exact, op_smooth=mxu, op_cheb2=k2,
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
    assert st.iterations == st_base.iterations
    assert st.solution_l2_norm == pytest.approx(
        st_base.solution_l2_norm, rel=1e-7
    )


@pytest.mark.parametrize(
    "p,n,b,deg",
    [
        (2, 8, 4, 5),   # production pair count (2 pairs), edge blocks
        (4, 4, 4, 5),   # production degree, whole-grid block
        (2, 16, 4, 3),  # single pair == the rout pair (no mid pairs)
        (2, 8, 8, 5),   # single block per axis (nbi == nbj == 1)
    ],
)
def test_cheb2lr_matches_smooth_then_residual(p, n, b, deg):
    """The S=3 "pair + r_out" kernel (mode cheb2lr): smooth_and_residual
    must equal smooth() followed by residual() to f32 roundoff in
    exact mode — the fused pre-restriction residual of VERDICT r4 item 2."""
    sp = FESpace(HyperCubeMesh(3, int(np.log2(n))), p)
    op = make_pallas_laplace(sp, jnp.float32, bx=b, by=b, interpret=True)
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    k2 = make_cheb2(sp, jnp.float32, bx=b, by=b, interpret=True, exact=True)
    k2r = make_cheb2(sp, jnp.float32, bx=b, by=b, interpret=True,
                     exact=True, rout=True)
    base = FusedChebyshev(degree=deg, op=op, op_smooth=op, theta=theta,
                          delta=delta, trimmed_io=True, op_cheb2=k2)
    fused = FusedChebyshev(degree=deg, op=op, op_smooth=op, theta=theta,
                           delta=delta, trimmed_io=True, op_cheb2=k2,
                           op_cheb2r=k2r)
    bt, ut = _masked_state(sp, op, 7)

    ua = np.asarray(base.smooth(ut, bt))
    ra = np.asarray(base.residual(jnp.asarray(ua), bt))
    ub, rb = fused.smooth_and_residual(ut, bt)
    ub, rb = np.asarray(ub), np.asarray(rb)
    assert np.abs(ua - ub).max() <= 2e-5 * np.abs(ua).max()
    assert np.abs(ra - rb).max() <= 2e-5 * np.abs(ra).max()


def test_cheb2lr_fallback_without_kernel():
    """smooth_and_residual without an op_cheb2r kernel (or with an odd
    recurrence tail) must fall back to smooth() + residual() unchanged."""
    sp = FESpace(HyperCubeMesh(3, 3), 2)
    op = make_pallas_laplace(sp, jnp.float32, bx=4, by=4, interpret=True)
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    k2 = make_cheb2(sp, jnp.float32, bx=4, by=4, interpret=True, exact=True)
    k2r = make_cheb2(sp, jnp.float32, bx=4, by=4, interpret=True,
                     exact=True, rout=True)
    bt, ut = _masked_state(sp, op, 9)
    # no rout kernel
    sm = FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                        delta=delta, trimmed_io=True, op_cheb2=k2)
    u1, r1 = sm.smooth_and_residual(ut, bt)
    u0 = sm.smooth(ut, bt)
    r0 = sm.residual(u0, bt)
    assert np.allclose(np.asarray(u0), np.asarray(u1))
    assert np.allclose(np.asarray(r0), np.asarray(r1))
    # odd recurrence tail (degree 4 -> 3 steps): must fall back, not fuse
    smo = FusedChebyshev(degree=4, op=op, op_smooth=op, theta=theta,
                         delta=delta, trimmed_io=True, op_cheb2=k2,
                         op_cheb2r=k2r)
    u2, r2 = smo.smooth_and_residual(ut, bt)
    u3 = smo.smooth(ut, bt)
    r3 = smo.residual(u3, bt)
    assert np.abs(np.asarray(u2) - np.asarray(u3)).max() <= 1e-6
    assert np.abs(np.asarray(r2) - np.asarray(r3)).max() <= 1e-6


def test_cheb2lr_costs_at_most_one_iteration():
    """Production grade (bf16 matrices + bf16 state streams) rout kernel
    wired into the fine-level smoother: the incremental r_out is
    RECURRENCE-grade — bf16-A errors accumulate in the r stream across the
    pairs (~0.3 %/pair at residual scale), which measurably costs ONE extra
    CG iteration (4 -> 5 here).  That is far from the naive bf16-residual
    catastrophe (count doubling, CLAUDE.md round-2 lesson) but it is why
    PMG_CHEB2R defaults OFF: the exact banded residual keeps golden counts.
    This test pins the trade-off so the opt-in can never silently become a
    count-doubling trap."""
    dim, p, r = 3, 4, 2
    base = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    _, st_base = base.solve()

    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    exact = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True
    )
    mxu = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True, core="mxu"
    )
    k2 = make_cheb2(prob.spaces[-1], jnp.float32, bx=4, by=4,
                    interpret=True)
    k2r = make_cheb2(prob.spaces[-1], jnp.float32, bx=4, by=4,
                     interpret=True, rout=True)
    lv = list(prob.levels)
    l = lv[-1]
    sm = FusedChebyshev(
        degree=l.smoother.degree, op=exact, op_smooth=mxu, op_cheb2=k2,
        op_cheb2r=k2r,
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
    # measured: exactly one extra iteration from the recurrence-grade
    # residual; anything beyond +1 means the kernel regressed toward the
    # naive-bf16-residual failure mode
    assert st_base.iterations <= st.iterations <= st_base.iterations + 1
    assert st.solution_l2_norm == pytest.approx(
        st_base.solution_l2_norm, rel=1e-7
    )


def test_cheb2_auto_ladder_degrades_on_compile_crash(monkeypatch):
    """Fault injection for the library fallback ladder (VERDICT r3 item 4):
    when the first candidate block's compile probe fails, make_cheb2_auto
    returns the next rung; when every rung fails it returns None (callers
    then run the single-step fused pipeline) and the production solve still
    converges with the golden CG history."""
    from portable_multigrid_tpu.ops import pallas_cheb2 as pc2

    sp = FESpace(HyperCubeMesh(3, 4), 2)  # n=16: rungs (16,8),(8,8),(16,16)

    # rung 1 crashes -> rung 2 (8,8) is picked
    monkeypatch.setattr(
        pc2, "cheb2_compile_ok",
        lambda kern, *a, **k: (kern.bx, kern.by) != (16, 8),
    )
    kern = pc2.make_cheb2_auto(sp, jnp.float32, interpret=True,
                               validate=True)
    assert kern is not None and (kern.bx, kern.by) == (8, 8)

    # every rung crashes -> None (single-step fused pipeline)
    monkeypatch.setattr(pc2, "cheb2_compile_ok", lambda *a, **k: False)
    assert pc2.make_cheb2_auto(sp, jnp.float32, interpret=True,
                               validate=True) is None

    # the degraded configuration preserves the CG convergence history:
    # solve once with a ladder-picked pair kernel (first candidate fails
    # its probe), once fully degraded, and compare both against the plain
    # mixed-precision baseline (small r=3 grid keeps interpret mode fast)
    dim, p, r = 3, 2, 3
    monkeypatch.setattr(
        pc2, "cheb2_compile_ok",
        lambda kern, *a, **k: (kern.bx, kern.by) != (16, 8),
    )
    sp3 = FESpace(HyperCubeMesh(dim, r), p)
    kern = pc2.make_cheb2_auto(sp3, jnp.float32, interpret=True,
                               validate=True)
    assert kern is not None and (kern.bx, kern.by) == (8, 8)
    base = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    _, st_base = base.solve()

    def solve_with(k2):
        prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
        exact = make_pallas_laplace(
            prob.spaces[-1], jnp.float32, bx=8, by=8, interpret=True
        )
        mxu = make_pallas_laplace(
            prob.spaces[-1], jnp.float32, bx=8, by=8, interpret=True,
            core="mxu",
        )
        lv = list(prob.levels)
        l = lv[-1]
        sm = FusedChebyshev(
            degree=l.smoother.degree, op=exact, op_smooth=mxu, op_cheb2=k2,
            theta=l.smoother.theta, delta=l.smoother.delta, trimmed_io=True,
            state_dtype="bf16",
        )
        lv[-1] = MGLevel(op=exact, smoother=sm, transfer=l.transfer)
        wired, fine_trim = wire_trimmed(lv)
        prob.levels = tuple(wired)
        prob.fine_trimmed = fine_trim
        _, st = prob.solve()
        return st

    st_pair = solve_with(kern)       # rung-2 (8,8) pair kernel
    st_degraded = solve_with(None)   # all rungs failed: single-step fused
    for st in (st_pair, st_degraded):
        assert st.converged
        assert st.iterations == st_base.iterations
        assert st.solution_l2_norm == pytest.approx(
            st_base.solution_l2_norm, rel=1e-7
        )
