"""Round-3 TPU batch 13: anisotropic-padded mega kernel on hardware +
benches with it + the full reference sweep (Q1..Q7, 2D p-ladder,
elasticity).
"""

import json
import os

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.utils.profiling import measure_op


def probe(tag, fn):
    try:
        out = fn()
        rec = {"case": tag, "ok": True}
        if isinstance(out, dict):
            rec.update(out)
        print(json.dumps(rec), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:140]}), flush=True)
        return False


def aot(f, *args):
    jax.jit(f).lower(*args).compile()


from portable_multigrid_tpu.ops.pallas_coarse import make_coarse_cycle

ok_mega = False
for k in (2, 5):
    tail = [FESpace(HyperCubeMesh(3, r), 4) for r in range(0, k)]
    kern = make_coarse_cycle(tail, jnp.float32)
    src = jax.random.normal(
        jax.random.PRNGKey(3),
        tuple(s - 1 for s in tail[-1].grid_shape), jnp.float32)
    ok_mega = probe(
        f"mega_aniso_k{k}",
        lambda kern=kern, src=src: {
            "ms": measure_op(kern.apply, src, repeats=2) * 1e3})
    del kern
    if not ok_mega:
        break

import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    os.environ["PMG_BENCH_DEGREE"] = env.pop("degree", "4")
    for kk, v in env.items():
        os.environ[kk] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)


if ok_mega:
    run_bench("r6_mega", PMG_BENCH_PALLAS_TRANSFER="1",
              PMG_BENCH_MEGA_COARSE="1")
    run_bench("r7_mega", r="7", PMG_BENCH_PALLAS_TRANSFER="1",
              PMG_BENCH_MEGA_COARSE="1")

# --- the reference sweep ---------------------------------------------------
os.environ["PMG_BENCH_MEGA_COARSE"] = "1" if ok_mega else "0"
os.environ["PMG_BENCH_PALLAS_TRANSFER"] = "1"
for degree, r, note in (
    (1, 7, "pallas 128 lanes"),
    (2, 7, "pallas 256 lanes"),
    (3, 7, "pallas 384 lanes"),
    (5, 6, "kron (320 lanes ineligible)"),
    (6, 6, "pallas 384 lanes"),
    (7, 5, "kron (224 lanes ineligible)"),
):
    run_bench(f"sweep_q{degree}_r{r}_{note}", r=str(r), degree=str(degree))

import time

from portable_multigrid_tpu.models.poisson import PolynomialMultigridPoisson
from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid


def time_solve(mk, tag, rtol=1e-5):
    try:
        prob = mk()
        _, st0 = prob.solve(rtol=rtol)  # warm/compile
        t0 = time.perf_counter()
        _, st = prob.solve(rtol=rtol)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "sweep": tag, "n_dofs": st.n_dofs, "iterations": st.iterations,
            "solve_s": dt, "dofs_per_s": st.n_dofs / dt,
        }), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"sweep": tag, "error": repr(e)[:300]}), flush=True)


time_solve(lambda: PolynomialMultigridPoisson(
    2, 7, 9, dtype=jnp.float32, variant="kron"), "2d_q7_pladder_r9")
time_solve(lambda: ElasticityMultigrid(3, 3, 4, dtype=jnp.float32),
           "3d_q3_elasticity_r4")
