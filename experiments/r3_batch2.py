"""Round-3 TPU batch 2: bisect the r=6 Mosaic crashes + mega-kernel timing.

Batch-1 findings: trimmed-pipeline bench crashed the Mosaic compile at r=6
with AND without pallas transfers (opaque helper exit 1), while the same
composition compiled at r=5 (entry()) and the round-2 path still works.
This batch compiles each new kernel standalone to find the culprits, with
the transpose-free transfer contraction fix in, then re-runs the bench with
the working combination.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.utils.profiling import measure_op


def case(tag, fn):
    try:
        out = fn()
        print(json.dumps({"case": tag, **out}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:300]}), flush=True)
        return False


sp6 = FESpace(HyperCubeMesh(3, 6), 4)
sp5 = FESpace(HyperCubeMesh(3, 5), 4)
g6 = sp6.grid_shape
t6 = tuple(s - 1 for s in g6)
key = jax.random.PRNGKey(0)
ut = jax.random.normal(key, t6, jnp.float32)
rt = jax.random.normal(jax.random.PRNGKey(1), t6, jnp.float32)

# --- A: trimmed kernel modes standalone at r=6 ----------------------------
for b in (16, 8):
    op = make_pallas_laplace(sp6, jnp.float32, bx=b, by=b, core="banded")
    scal = jnp.asarray([1.1, 1.1], jnp.float32)

    def r3t(v, op=op, scal=scal):
        r0, d0, x0 = op._run("residual3t", v, (rt,), scal)
        return x0

    def r1t(v, op=op):
        (r0,) = op._run("residual1t", v, (rt,))
        return r0

    case(f"residual3t_banded_{b}x{b}_r6",
         lambda f=r3t: {"ms": measure_op(f, ut, repeats=2) * 1e3})
    case(f"residual1t_banded_{b}x{b}_r6",
         lambda f=r1t: {"ms": measure_op(f, ut, repeats=2) * 1e3})
    del op
    if b == 16:
        # if 16x16 worked, no need for the 8x8 fallback datapoints
        pass

# --- B: fixed pallas transfer kernels standalone --------------------------
from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

for bf in (16, 8):
    try:
        pt = make_pallas_h_transfer(sp5, sp6, jnp.float32, bf=bf)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"ptr_build_bf{bf}", "error": repr(e)[:200]}),
              flush=True)
        continue
    ok = case(f"ptr_restrict_bf{bf}_r6",
              lambda pt=pt: {"ms": measure_op(pt.restrict, ut,
                                              repeats=2) * 1e3})
    ct = jax.random.normal(jax.random.PRNGKey(2),
                           tuple(s - 1 for s in sp5.grid_shape), jnp.float32)
    ok &= case(f"ptr_prolongate_bf{bf}_r6",
               lambda pt=pt, ct=ct: {
                   "ms": measure_op(pt.prolongate, ct, repeats=2) * 1e3})
    ok &= case(f"ptr_prol_add_bf{bf}_r6",
               lambda pt=pt, ct=ct: {
                   "ms": measure_op(lambda u: pt.prolongate_and_add(u, ct),
                                    ut, repeats=2) * 1e3})
    del pt
    if ok:
        break  # first fully-working block size wins

# --- C: coarse-tail mega-kernel (spaces r0..r4) ---------------------------
from portable_multigrid_tpu.ops.pallas_coarse import make_coarse_cycle

spaces_tail = [FESpace(HyperCubeMesh(3, r), 4) for r in range(0, 5)]
try:
    kern = make_coarse_cycle(spaces_tail, jnp.float32)
    src = jax.random.normal(jax.random.PRNGKey(3),
                            tuple(s - 1 for s in spaces_tail[-1].grid_shape),
                            jnp.float32)
    case("mega_coarse_r0_r4",
         lambda: {"ms": measure_op(kern.apply, src, repeats=2) * 1e3})
    del kern
except Exception as e:  # noqa: BLE001
    print(json.dumps({"case": "mega_coarse_r0_r4", "error": repr(e)[:300]}),
          flush=True)

# --- D: full bench with working combinations ------------------------------
import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    for k, v in env.items():
        os.environ[k] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)


run_bench("r6_trimmed_ptr_mega", PMG_BENCH_TRIMMED="1",
          PMG_BENCH_PALLAS_TRANSFER="1", PMG_BENCH_MEGA_COARSE="1")
run_bench("r6_trimmed_rb8", PMG_BENCH_TRIMMED="1",
          PMG_BENCH_PALLAS_TRANSFER="1", PMG_BENCH_MEGA_COARSE="1",
          PMG_BENCH_RESID_BLOCK="8")
run_bench("r7_trimmed_ptr_mega", r="7", PMG_BENCH_RESID_BLOCK="")
