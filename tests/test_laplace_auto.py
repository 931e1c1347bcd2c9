"""make_laplace_auto dispatch rules (host-side construction only).

Pins the Mosaic-crash guards without compiling any kernel: the banded core
crashes the Mosaic compiler at p=6 regardless of block size (r3 batch-14b
bisect: Q5 zpad-384 and Q7 banded compile at the same lane counts, so the
crash is degree-specific), while the bf16 mxu core compiles at p=6 — the
auto path must route the exact role to the XLA kron fallback at p=6 and
keep the fused-smoother roles on Pallas.
"""

import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.laplace import LaplaceOperator
from portable_multigrid_tpu.ops.pallas_laplace import (
    PallasLaplaceOperator,
    make_laplace_auto,
)


def test_q6_banded_routes_to_kron():
    sp = FESpace(HyperCubeMesh(3, 5), 6)  # 32 cells * p6 = 192 lanes
    op = make_laplace_auto(sp, jnp.float32)
    assert isinstance(op, LaplaceOperator)
    assert not isinstance(op, PallasLaplaceOperator)


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
