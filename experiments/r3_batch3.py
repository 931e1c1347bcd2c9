"""Round-3 TPU batch 3: mega-kernel bisection, transfer pair, fixed benches.

Batch-2 found: residual3t banded crashes ONLY at 16x16/256 lanes (8x8 fine,
now auto-twinned), transfer kernels compile+run after the transpose-free
fix (prol_add 0.47 ms), mega-kernel crashes Mosaic.  Here: bisect the mega
kernel by level count, measure the composed transfer pair, re-run benches
with the resid3 twin wired (MEGA off).
"""

import json
import os

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
t6 = tuple(s - 1 for s in sp6.grid_shape)
ut = jax.random.normal(jax.random.PRNGKey(0), t6, jnp.float32)
rt = jax.random.normal(jax.random.PRNGKey(1), t6, jnp.float32)

# --- A: residual3t at (16, 8) — possibly faster than the 8x8 twin ---------
op168 = make_pallas_laplace(sp6, jnp.float32, bx=16, by=8, core="banded")
scal = jnp.asarray([1.1, 1.1], jnp.float32)


def r3t(v):
    r0, d0, x0 = op168._run("residual3t", v, (rt,), scal)
    return x0


case("residual3t_banded_16x8_r6",
     lambda: {"ms": measure_op(r3t, ut, repeats=2) * 1e3})
case("apply_banded_16x8_r6",
     lambda: {"ms": measure_op(op168.apply,
                               jax.random.normal(jax.random.PRNGKey(4),
                                                 sp6.grid_shape, jnp.float32),
                               repeats=2) * 1e3})
del op168

# --- B: composed transfer pair (fine -> coarse -> fine) -------------------
from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

pt = make_pallas_h_transfer(sp5, sp6, jnp.float32, bf=16)
case("ptr_pair_bf16_r6",
     lambda: {"ms": measure_op(lambda v: pt.prolongate(pt.restrict(v)), ut,
                               repeats=3) * 1e3})
del pt

# --- C: mega-kernel bisection by level count ------------------------------
from portable_multigrid_tpu.ops.pallas_coarse import make_coarse_cycle

for k in (1, 2, 3, 4, 5):
    tail = [FESpace(HyperCubeMesh(3, r), 4) for r in range(0, k)]
    try:
        kern = make_coarse_cycle(tail, jnp.float32)
        src = jax.random.normal(
            jax.random.PRNGKey(3),
            tuple(s - 1 for s in tail[-1].grid_shape), jnp.float32)
        ok = case(f"mega_k{k}",
                  lambda kern=kern, src=src: {
                      "ms": measure_op(kern.apply, src, repeats=2) * 1e3})
        del kern
        if not ok:
            break
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"mega_k{k}", "error": repr(e)[:300]}),
              flush=True)
        break

# --- D: benches with the resid3 twin (mega off) ---------------------------
import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    os.environ["PMG_BENCH_MEGA_COARSE"] = "0"
    for k, v in env.items():
        os.environ[k] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)


run_bench("r6_trimmed_ptr_twin")
run_bench("r7_trimmed_ptr_twin", r="7")
