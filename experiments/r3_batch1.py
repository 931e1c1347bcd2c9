"""Round-3 TPU batch 1: trimmed V-cycle pipeline + r=7 asymmetric blocks.

1. r=6 Q4 production V-cycle, trimmed pipeline vs round-2 composition.
2. r=7 Q4 (512 lanes): can asymmetric blocks (16x8 / 8x16) dodge the
   16x16@512-lane Mosaic crash, and what do they buy over 8x8?
"""

import json
import os

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.utils.profiling import measure_op

import bench


def run_bench(r, trimmed, pallas_tr):
    os.environ["PMG_BENCH_REFINEMENTS"] = str(r)
    os.environ["PMG_BENCH_TRIMMED"] = "1" if trimmed else "0"
    os.environ["PMG_BENCH_PALLAS_TRANSFER"] = "1" if pallas_tr else "0"
    print(f"--- bench r={r} trimmed={trimmed} ptr={pallas_tr} ---",
          flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench_r": r, "trimmed": trimmed,
                          "error": repr(e)[:1200]}), flush=True)


run_bench(6, True, True)
run_bench(6, True, False)
run_bench(6, False, False)

# --- isolated pallas transfer pair at r=6 ---------------------------------
from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

sp6 = FESpace(HyperCubeMesh(3, 6), 4)
sp5 = FESpace(HyperCubeMesh(3, 5), 4)
try:
    pt = make_pallas_h_transfer(sp5, sp6, jnp.float32)
    ftrim = tuple(s - 1 for s in sp6.grid_shape)
    vf = jax.random.normal(jax.random.PRNGKey(3), ftrim, jnp.float32)
    t = measure_op(lambda v: pt.prolongate(pt.restrict(v)), vf, repeats=3)
    print(json.dumps({"case": "pallas_transfer_pair_r6", "pair_ms": t * 1e3}),
          flush=True)
    del pt, vf
except Exception as e:  # noqa: BLE001
    print(json.dumps({"case": "pallas_transfer_pair_r6",
                      "error": repr(e)[:800]}), flush=True)

# --- r=7 asymmetric blocks ------------------------------------------------
sp7 = FESpace(HyperCubeMesh(3, 7), 4)
u7 = jax.random.normal(jax.random.PRNGKey(0), sp7.grid_shape, jnp.float32)
for core in ("banded", "mxu"):
    for bx, by in ((16, 8), (8, 16)):
        tag = f"r7_{core}_{bx}x{by}"
        try:
            op = make_pallas_laplace(sp7, jnp.float32, bx=bx, by=by, core=core)
            t = measure_op(op.apply, u7, repeats=2)
            print(json.dumps({"case": tag, "ms": t * 1e3,
                              "gdof_s": sp7.n_dofs / t / 1e9}), flush=True)
            del op
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"case": tag, "error": repr(e)[:600]}),
                  flush=True)

run_bench(7, True, True)
