"""Fused Pallas transfer kernels vs the XLA Transfer algebra (interpret).

The pallas kernels fold weights/masks into per-axis 1D matrices and run
hi/lo-split bf16 MXU contractions (~1e-7 relative), so they must match the
exact XLA transfer to bf16-pair precision, preserve the transpose property,
and leave golden convergence counts unchanged (the V-cycle count test).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.transfer import make_h_transfer
from portable_multigrid_tpu.ops.pallas_transfer import (
    make_pallas_h_transfer,
    pallas_h_transfer_eligible,
)


@pytest.fixture(scope="module")
def spaces():
    fine = FESpace(HyperCubeMesh(3, 3), 4)
    coarse = FESpace(HyperCubeMesh(3, 2), 4)
    return coarse, fine


def _trim(a):
    return a[tuple(slice(0, s - 1) for s in a.shape)]


def test_matches_xla_transfer(spaces):
    coarse, fine = spaces
    ref = make_h_transfer(coarse, fine, jnp.float32)
    pt = make_pallas_h_transfer(coarse, fine, jnp.float32, bf=4,
                                interpret=True)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal(fine.grid_shape), jnp.float32)
    c = jnp.asarray(rng.standard_normal(coarse.grid_shape), jnp.float32)
    u = jnp.asarray(rng.standard_normal(fine.grid_shape), jnp.float32)

    want_r = np.asarray(ref.restrict(f))
    got_r = np.asarray(pt.restrict(_trim(f)))
    scale = np.abs(want_r).max()
    assert np.abs(_trim(want_r) - got_r).max() <= 2e-5 * scale

    want_p = np.asarray(ref.prolongate(c))
    got_p = np.asarray(pt.prolongate(_trim(c)))
    scale = np.abs(want_p).max()
    assert np.abs(_trim(want_p) - got_p).max() <= 2e-5 * scale

    want_a = np.asarray(u + want_p)
    got_a = np.asarray(pt.prolongate_and_add(_trim(u), _trim(c)))
    assert np.abs(_trim(want_a) - got_a).max() <= 2e-5 * np.abs(want_a).max()


def test_full_coarse_rep(spaces):
    """coarse_trimmed=False pads/trims the coarse side (XLA-level handoff)."""
    coarse, fine = spaces
    ref = make_h_transfer(coarse, fine, jnp.float32)
    pt = make_pallas_h_transfer(coarse, fine, jnp.float32, bf=4,
                                coarse_trimmed=False, interpret=True)
    rng = np.random.default_rng(1)
    f = jnp.asarray(rng.standard_normal(fine.grid_shape), jnp.float32)
    want = np.asarray(ref.restrict(f))
    got = np.asarray(pt.restrict(_trim(f)))
    assert got.shape == want.shape
    assert np.abs(want - got).max() <= 2e-5 * np.abs(want).max()
    c = jnp.asarray(rng.standard_normal(coarse.grid_shape) *
                    np.asarray(coarse.free_mask()), jnp.float32)
    want_p = _trim(np.asarray(ref.prolongate(c)))
    got_p = np.asarray(pt.prolongate(c))
    assert np.abs(want_p - got_p).max() <= 2e-5 * np.abs(want_p).max()


def test_transpose_property(spaces):
    """<P c, f> == <c, R f> with the SAME rounded matrices on both sides."""
    coarse, fine = spaces
    pt = make_pallas_h_transfer(coarse, fine, jnp.float32, bf=4,
                                interpret=True)
    rng = np.random.default_rng(2)
    ft = jnp.asarray(
        rng.standard_normal([s - 1 for s in fine.grid_shape]), jnp.float32)
    ct = jnp.asarray(
        rng.standard_normal([s - 1 for s in coarse.grid_shape]), jnp.float32)
    lhs = float(jnp.vdot(pt.prolongate(ct), ft))
    rhs = float(jnp.vdot(ct, pt.restrict(ft)))
    assert lhs == pytest.approx(rhs, rel=2e-5)


def test_eligibility():
    f6 = FESpace(HyperCubeMesh(3, 6), 4)
    c5 = FESpace(HyperCubeMesh(3, 5), 4)
    c4 = FESpace(HyperCubeMesh(3, 4), 4)
    assert pallas_h_transfer_eligible(c5, f6)
    # r5->r4: coarse side has 64 lanes — sub-128 pallas outputs crash
    # Mosaic, so the pair falls back to the XLA trimmed transfer
    assert not pallas_h_transfer_eligible(c4, c5)
    assert not pallas_h_transfer_eligible(
        FESpace(HyperCubeMesh(3, 3), 4), c4)  # fine Z=64


def test_vcycle_counts_with_pallas_transfer():
    """Swapping the fine-level transfer for the fused pallas kernels leaves
    the CG convergence history unchanged (the production gate)."""
    from portable_multigrid_tpu.models.mixed import MixedPrecisionPoisson
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev
    from portable_multigrid_tpu.solvers.vcycle import MGLevel, VCycle, \
        wire_trimmed

    dim, p, r = 3, 4, 2
    base = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    _, st0 = base.solve()

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
    pt = make_pallas_h_transfer(
        prob.spaces[-2], prob.spaces[-1], jnp.float32, bf=4,
        coarse_trimmed=False, interpret=True,
    )
    lv[-1] = MGLevel(op=exact, smoother=sm, transfer=pt)
    # wire_trimmed must leave the natively-trimmed pallas transfer alone
    wired, fine_trim = wire_trimmed(lv)
    assert fine_trim
    assert wired[-1].transfer is pt
    prob.levels = tuple(wired)
    prob.fine_trimmed = True
    _, st = prob.solve()
    assert st.converged
    assert st.iterations == st0.iterations
    assert st.solution_l2_norm == pytest.approx(
        st0.solution_l2_norm, rel=1e-9
    )
