"""make_laplace_auto dispatch rules (host-side construction only).

Pins the Mosaic-crash guards without compiling any kernel: the banded core
crashes the Mosaic compiler at p=6 regardless of block size (r3 batch-14b
bisect: Q5 zpad-384 and Q7 banded compile at the same lane counts, so the
crash is degree-specific), while the bf16 mxu core compiles at p=6 — the
auto path routes the exact role to the compile-probed f32-faithful mxu3
rescue on a TPU backend (VERDICT r3 item 5: the Q6 fast path), falling
back to the XLA kron operator, and keeps the fused-smoother roles on
Pallas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.models.mixed import MixedPrecisionPoisson
from portable_multigrid_tpu.ops.laplace import LaplaceOperator
from portable_multigrid_tpu.ops import pallas_laplace as pll
from portable_multigrid_tpu.ops.pallas_laplace import (
    PallasLaplaceOperator,
    make_laplace_auto,
    make_pallas_laplace,
)


def test_q6_banded_routes_to_kron():
    # on the CPU backend the mxu3 rescue cannot compile-probe, so the
    # exact role falls back to kron exactly as before
    sp = FESpace(HyperCubeMesh(3, 5), 6)  # 32 cells * p6 = 192 lanes
    op = make_laplace_auto(sp, jnp.float32)
    assert isinstance(op, LaplaceOperator)
    assert not isinstance(op, PallasLaplaceOperator)


def test_q6_exact_rescue_picks_probed_mxu3(monkeypatch):
    """On a TPU backend the p=6 exact role gets the mxu3 kernel when its
    compile probe passes, and kron when every candidate fails."""
    sp = FESpace(HyperCubeMesh(3, 5), 6)
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")

    monkeypatch.setattr(pll, "laplace_compile_ok", lambda op, **k: True)
    op = make_laplace_auto(sp, jnp.float32)
    assert isinstance(op, PallasLaplaceOperator) and op.core == "mxu3"

    monkeypatch.setattr(pll, "laplace_compile_ok", lambda op, **k: False)
    op = make_laplace_auto(sp, jnp.float32)
    assert not isinstance(op, PallasLaplaceOperator)
    # the mxu smoother role is likewise probed at crash-listed degrees
    assert not isinstance(
        make_laplace_auto(sp, jnp.float32, core="mxu"), PallasLaplaceOperator
    )


def test_q6_mxu3_exact_preserves_convergence_counts():
    """Full mixed-precision solve with the fine level's EXACT role on the
    mxu3 kernel (the Q6 rescue composition: mxu3 residuals/CG + mxu fused
    recurrence): CG history matches the plain baseline."""
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev
    from portable_multigrid_tpu.solvers.vcycle import MGLevel, wire_trimmed

    dim, p, r = 3, 6, 2
    base = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    _, st_base = base.solve()

    prob = MixedPrecisionPoisson(dim, p, r, mg_dtype=jnp.float32)
    exact = make_pallas_laplace(
        prob.spaces[-1], jnp.float32, bx=4, by=4, interpret=True,
        core="mxu3",
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
    prob.levels = tuple(wired)
    prob.fine_trimmed = fine_trim
    _, st = prob.solve()
    assert st.converged
    assert st.iterations == st_base.iterations
    assert st.solution_l2_norm == pytest.approx(
        st_base.solution_l2_norm, rel=1e-7
    )


def test_q6_mxu_core_stays_pallas():
    sp = FESpace(HyperCubeMesh(3, 5), 6)
    op = make_laplace_auto(sp, jnp.float32, core="mxu")
    assert isinstance(op, PallasLaplaceOperator)


def test_q4_banded_stays_pallas():
    sp = FESpace(HyperCubeMesh(3, 5), 4)  # 128 lanes, the flagship config
    op = make_laplace_auto(sp, jnp.float32)
    assert isinstance(op, PallasLaplaceOperator)


def test_q5_lane_padded_pallas():
    sp = FESpace(HyperCubeMesh(3, 5), 5)  # 160 lanes -> zpad 96
    op = make_laplace_auto(sp, jnp.float32)
    assert isinstance(op, PallasLaplaceOperator)
    assert op.zpad == 96


def test_zpad_up_admits_coarse_levels(monkeypatch):
    """PMG_ZPAD_UP=1 pads sub-128-lane coarse levels up to one 128-lane
    tile so the whole hierarchy rides the fused kernels (the
    coarse-recursion lever); default policy keeps them on kron."""
    sp3 = FESpace(HyperCubeMesh(3, 3), 4)  # 32 lanes
    sp2 = FESpace(HyperCubeMesh(3, 2), 4)  # 16 lanes, n=4 < block edge 8

    assert not isinstance(
        make_laplace_auto(sp3, jnp.float32), PallasLaplaceOperator
    )

    # on a TPU backend the pad-up policy is the DEFAULT (no env needed;
    # measured 1.053e9 DoF/s at r=6 Q4, experiments/r4_batch4.py)
    monkeypatch.delenv("PMG_ZPAD_UP", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    monkeypatch.setattr(pll, "laplace_compile_ok", lambda op, **k: True)
    op = make_laplace_auto(sp3, jnp.float32)
    assert isinstance(op, PallasLaplaceOperator)
    assert op.zpad == 96 and op.bx == 8
    op2 = make_laplace_auto(sp2, jnp.float32)
    assert isinstance(op2, PallasLaplaceOperator)
    assert op2.zpad == 112 and op2.bx == 4  # whole-grid block

    # a probe failure degrades to kron exactly as for lane-exact grids
    monkeypatch.setattr(pll, "laplace_compile_ok", lambda op, **k: False)
    assert not isinstance(
        make_laplace_auto(sp3, jnp.float32), PallasLaplaceOperator
    )

    # PMG_ZPAD_UP=0 is the TPU-side escape hatch
    monkeypatch.setenv("PMG_ZPAD_UP", "0")
    monkeypatch.setattr(pll, "laplace_compile_ok", lambda op, **k: True)
    assert not isinstance(
        make_laplace_auto(sp3, jnp.float32), PallasLaplaceOperator
    )
