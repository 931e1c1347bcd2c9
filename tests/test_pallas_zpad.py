"""Lane-padded Pallas operators (interpret mode).

Grids whose z lane extent n*p is not a 128-multiple (Q5: 320, Q7: 224)
run the fused kernels on state padded to the next 128-multiple
(ops/pallas_laplace.py lane_pad).  The pad region is structurally inert —
band rows are zero there — so the padded operator must agree with the
unpadded one to roundoff through every mode and through the trimmed
V-cycle wiring.  These tests exercise the machinery with an explicit
small zpad on a tiny grid (padding correctness is size-independent; the
real Q5/Q7 extents are validated on the TPU in the bench sweep).
"""

import numpy as np
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.ops.transfer import make_h_transfer
from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev, make_chebyshev
from portable_multigrid_tpu.solvers.vcycle import MGLevel, VCycle, wire_trimmed

ZPAD = 8


def _ops(sp):
    base = make_pallas_laplace(
        sp, jnp.float32, bx=4, by=4, interpret=True, core="banded"
    )
    padded = make_pallas_laplace(
        sp, jnp.float32, bx=4, by=4, interpret=True, core="banded", zpad=ZPAD
    )
    return base, padded


def test_zpad_apply_matches_unpadded():
    sp = FESpace(HyperCubeMesh(3, 3), 4)
    base, padded = _ops(sp)
    assert padded.zpad == ZPAD
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape), jnp.float32)
    a = np.asarray(base.apply(u))
    b = np.asarray(padded.apply(u))
    assert np.abs(a - b).max() <= 1e-6 * np.abs(a).max()


def test_zpad_fused_smoother_matches_unpadded():
    """apply/smooth/residual agree between padded and unpadded operators in
    both full-grid and trimmed-io representations."""
    sp = FESpace(HyperCubeMesh(3, 3), 4)
    base, padded = _ops(sp)
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)

    def mk(op, trimmed):
        return FusedChebyshev(degree=5, op=op, op_smooth=op, theta=theta,
                              delta=delta, trimmed_io=trimmed)

    rng = np.random.default_rng(1)
    m = np.asarray(base.mask)
    b = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)
    u = jnp.asarray(rng.standard_normal(sp.grid_shape) * m, jnp.float32)

    # full-grid representation
    f0, f1 = mk(base, False), mk(padded, False)
    for fn in ("apply",):
        a, b_ = np.asarray(f0.apply(b)), np.asarray(f1.apply(b))
        assert np.abs(a - b_).max() <= 5e-6 * np.abs(a).max()
    sa, sb = np.asarray(f0.smooth(u, b)), np.asarray(f1.smooth(u, b))
    assert np.abs(sa - sb).max() <= 5e-6 * np.abs(sa).max()
    ra, rb = np.asarray(f0.residual(u, b)), np.asarray(f1.residual(u, b))
    assert np.abs(ra - rb).max() <= 5e-6 * np.abs(ra).max()

    # trimmed representation: padded trim carries ZPAD extra zero lanes
    t0, t1 = mk(base, True), mk(padded, True)
    tt = lambda a: jnp.asarray(np.asarray(a)[:-1, :-1, :-1])
    tp = lambda a: jnp.pad(tt(a), ((0, 0), (0, 0), (0, ZPAD)))
    za = np.asarray(t0.apply(tt(b)))
    zb = np.asarray(t1.apply(tp(b)))
    assert zb.shape[2] == za.shape[2] + ZPAD
    assert np.abs(zb[:, :, za.shape[2]:]).max() == 0.0  # pad stays zero
    assert np.abs(za - zb[:, :, : za.shape[2]]).max() <= 5e-6 * np.abs(za).max()
    sa = np.asarray(t0.smooth(tt(u), tt(b)))
    sb = np.asarray(t1.smooth(tp(u), tp(b)))
    assert np.abs(sa - sb[:, :, : sa.shape[2]]).max() <= 5e-6 * np.abs(sa).max()
    ra = np.asarray(t0.residual(tt(u), tt(b)))
    rb = np.asarray(t1.residual(tp(u), tp(b)))
    assert np.abs(ra - rb[:, :, : ra.shape[2]]).max() <= 5e-6 * np.abs(ra).max()


def _vcycle(sp_c, sp_f, fine_op):
    """Two-level hierarchy matching bench.py's wiring: kron coarse level +
    fused trimmed Pallas fine level."""
    from portable_multigrid_tpu.ops.laplace import make_laplace

    dtype = jnp.float32
    coarse_op = make_chebyshev(
        make_laplace(sp_c, dtype, variant="kron"),
        smoothing_range=1e-3, degree=None, eig_cg_n_iterations=sp_c.n_dofs,
    )
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)
    sm = FusedChebyshev(degree=5, op=fine_op, op_smooth=fine_op,
                        theta=theta, delta=delta, trimmed_io=True)
    levels = [
        MGLevel(op=coarse_op.op, smoother=coarse_op, transfer=None),
        MGLevel(op=fine_op, smoother=sm,
                transfer=make_h_transfer(sp_c, sp_f, dtype)),
    ]
    levels, fine_trim = wire_trimmed(levels)
    return VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                  fine_trimmed=fine_trim, levels=tuple(levels))


def test_zpad_up_hierarchy_matches_plain():
    """Every non-base level trimmed+padded with a DIFFERENT zpad (the
    PMG_ZPAD_UP coarse-level composition): TrimmedTransfer must convert
    between distinct per-level pad widths on both its fine and coarse
    sides.  The preconditioner action matches the all-plain hierarchy."""
    from portable_multigrid_tpu.ops.laplace import make_laplace

    dtype = jnp.float32
    sps = [FESpace(HyperCubeMesh(3, r), 4) for r in (1, 2, 3)]
    theta = jnp.asarray(1.3, jnp.float32)
    delta = jnp.asarray(0.9, jnp.float32)

    def build(zpads):
        levels = []
        for i, sp in enumerate(sps):
            if i == 0:
                sm = make_chebyshev(
                    make_laplace(sp, dtype, variant="kron"),
                    smoothing_range=1e-3, degree=None,
                    eig_cg_n_iterations=sp.n_dofs,
                )
                levels.append(MGLevel(op=sm.op, smoother=sm, transfer=None))
                continue
            if zpads is None:
                op = make_laplace(sp, dtype, variant="kron")
                sm = make_chebyshev(op, smoothing_range=15.0, degree=5,
                                    eig_cg_n_iterations=10)
            else:
                bx = min(4, sp.mesh.cells_per_axis)
                op = make_pallas_laplace(
                    sp, dtype, bx=bx, by=bx, interpret=True, core="banded",
                    zpad=zpads[i],
                )
                sm = FusedChebyshev(degree=5, op=op, op_smooth=op,
                                    theta=theta, delta=delta, trimmed_io=True)
            levels.append(MGLevel(
                op=op, smoother=sm,
                transfer=make_h_transfer(sps[i - 1], sp, dtype),
            ))
        levels, fine_trim = wire_trimmed(levels)
        return VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                      fine_trimmed=fine_trim, levels=tuple(levels))

    # plain baseline smoother != FusedChebyshev numerically only through
    # op precision; both use the exact banded/kron operators, so the cycle
    # actions agree to roundoff
    mg_pad = build({1: 12, 2: 8})
    mg_ref = build({1: 0, 2: 0})
    rng = np.random.default_rng(3)
    sp_f = sps[-1]
    m = np.asarray(FESpace(HyperCubeMesh(3, 3), 4).free_mask())
    b = jnp.asarray(rng.standard_normal(sp_f.grid_shape) * m, jnp.float32)
    a = np.asarray(mg_ref.apply(b))
    c = np.asarray(mg_pad.apply(b))
    assert a.shape == c.shape
    assert np.abs(a - c).max() <= 5e-6 * np.abs(a).max()


def test_zpad_vcycle_matches_unpadded():
    """The wired trimmed V-cycle (TrimmedTransfer zpad conversions, top-level
    pad/trim) gives the same preconditioner action with a lane-padded fine
    operator as with the unpadded one."""
    sp_c = FESpace(HyperCubeMesh(3, 2), 4)
    sp_f = FESpace(HyperCubeMesh(3, 3), 4)
    base, padded = _ops(sp_f)
    mg0 = _vcycle(sp_c, sp_f, base)
    mg1 = _vcycle(sp_c, sp_f, padded)
    rng = np.random.default_rng(2)
    m = np.asarray(base.mask)
    b = jnp.asarray(rng.standard_normal(sp_f.grid_shape) * m, jnp.float32)
    a = np.asarray(mg0.apply(b))
    c = np.asarray(mg1.apply(b))
    assert a.shape == c.shape
    assert np.abs(a - c).max() <= 5e-6 * np.abs(a).max()
