"""Coarse-tail mega-kernel vs the XLA V-cycle composition (interpret).

The kernel replays the identical recursion (operators, Chebyshev smoothers,
transfers, Chebyshev-as-solver coarsest level) in one Mosaic program; it
must match the XLA composition to f32-contraction roundoff, and leave CG
histories unchanged when used as the V-cycle's coarse solver.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from portable_multigrid_tpu.fem.mesh import (
    HyperCubeMesh,
    geometric_coarsening_sequence,
)
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.laplace import make_laplace
from portable_multigrid_tpu.ops.pallas_coarse import make_coarse_cycle
from portable_multigrid_tpu.ops.transfer import make_h_transfer
from portable_multigrid_tpu.solvers.chebyshev import make_chebyshev
from portable_multigrid_tpu.solvers.vcycle import MGLevel, VCycle


def _xla_tail(spaces, dtype):
    levels = []
    for i, sp in enumerate(spaces):
        op = make_laplace(sp, dtype, variant="kron")
        if i == 0:
            sm = make_chebyshev(op, smoothing_range=1e-3, degree=None,
                                eig_cg_n_iterations=sp.n_dofs)
        else:
            sm = make_chebyshev(op, smoothing_range=15.0, degree=5,
                                eig_cg_n_iterations=10)
        tr = make_h_transfer(spaces[i - 1], sp, dtype) if i > 0 else None
        levels.append(MGLevel(op=op, smoother=sm, transfer=tr))
    return VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                  levels=tuple(levels))


def test_matches_xla_cycle():
    dtype = jnp.float32
    spaces = [
        FESpace(m, 2)
        for m in geometric_coarsening_sequence(HyperCubeMesh(3, 2))
    ]
    mg = _xla_tail(spaces, dtype)
    kern = make_coarse_cycle(spaces, dtype, interpret=True)
    assert kern.degrees[1:] == tuple(
        l.smoother.degree for l in mg.levels[1:]
    )
    rng = np.random.default_rng(0)
    m = np.asarray(mg.levels[-1].op.mask)
    src = jnp.asarray(rng.standard_normal(spaces[-1].grid_shape) * m, dtype)
    want = np.asarray(mg.apply(src))
    got = np.asarray(kern.apply(src[:-1, :-1, :-1]))
    scale = np.abs(want).max()
    assert np.abs(want[:-1, :-1, :-1] - got).max() <= 2e-5 * scale


def test_counts_with_mega_coarse_level():
    """Production composition: pallas fine level + mega-kernel coarse tail
    preserves the CG history of the all-XLA hierarchy."""
    from portable_multigrid_tpu.models.mixed import MixedPrecisionPoisson
    from portable_multigrid_tpu.ops.pallas_coarse import CoarseCycleSmoother
    from portable_multigrid_tpu.solvers.vcycle import wire_trimmed

    dim, p, r = 3, 4, 2
    base = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    _, st0 = base.solve()

    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    # collapse levels 0..1 into the mega-kernel; keep the fine level as-is
    tail = prob.spaces[:2]
    kern = make_coarse_cycle(tail, jnp.float32, interpret=True)
    lv = list(prob.levels)
    mega = MGLevel(op=lv[1].op, smoother=CoarseCycleSmoother(kern=kern),
                   transfer=None)
    lv = [mega, lv[2]]
    wired, fine_trim = wire_trimmed(lv)
    prob.levels = tuple(wired)
    prob.fine_trimmed = fine_trim
    _, st = prob.solve()
    assert st.converged
    assert st.iterations == st0.iterations
    assert st.solution_l2_norm == pytest.approx(
        st0.solution_l2_norm, rel=1e-9
    )
