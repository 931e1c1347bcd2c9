"""Round-3 TPU batch 16: measure the bf16 recurrence-state smoother
(state_dtype="bf16": r/d streams stored bfloat16, last step writes only x)
and the lane-padded (zpad) kernel eligibility for Q5/Q7.

Batch-14b profile to beat: fine fused smooth 4.13 ms (77% of the 21.5 ms
r=6 cycle as 4 smooths), vcycle_r6 21.54 ms = 7.85e8 DoF/s.  The bf16
streams cut the smoother's per-step HBM traffic from 6 to 4 f32-equivalent
streams (and the last step from 5 to 3), a ~0.7x bandwidth bound.
"""

import json
import os

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import (
    HyperCubeMesh,
    geometric_coarsening_sequence,
)
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.solvers.vcycle import MGLevel, VCycle, wire_trimmed
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
        print(json.dumps({"case": tag, "error": repr(e)[:200]}), flush=True)
        return False


def build_bench_vcycle(refinements, state_dtype="bf16", degree=4):
    from portable_multigrid_tpu.ops.pallas_laplace import (
        PallasLaplaceOperator,
        make_laplace_auto,
        make_resid3_twin,
    )
    from portable_multigrid_tpu.ops.pallas_transfer import make_h_transfer_auto
    from portable_multigrid_tpu.ops.transfer import make_h_transfer
    from portable_multigrid_tpu.solvers.chebyshev import make_chebyshev

    dtype = jnp.float32
    mesh = HyperCubeMesh(3, refinements)
    spaces = [FESpace(m, degree) for m in geometric_coarsening_sequence(mesh)]
    levels = []
    prev_trimmed = False
    for i, sp in enumerate(spaces):
        lop = make_laplace_auto(sp, dtype, precision="high")
        fused = None
        if i > 0 and isinstance(lop, PallasLaplaceOperator):
            f = make_laplace_auto(sp, dtype, core="mxu")
            fused = f if isinstance(f, PallasLaplaceOperator) else None
        if i == 0:
            sm = make_chebyshev(lop, smoothing_range=1e-3, degree=None,
                                eig_cg_n_iterations=sp.n_dofs)
        else:
            resid3 = (make_resid3_twin(sp, lop, dtype)
                      if fused is not None else None)
            sm = make_chebyshev(
                lop, smoothing_range=15.0, degree=5,
                eig_cg_n_iterations=10, fused_smoother_op=fused,
                trimmed_io=fused is not None, resid3_op=resid3,
                state_dtype=state_dtype if fused is not None else "f32")
        cur_trimmed = bool(getattr(sm, "trimmed_io", False))
        tr = None
        if i > 0:
            if cur_trimmed:
                tr = make_h_transfer_auto(
                    spaces[i - 1], sp, dtype, cur_trimmed, prev_trimmed)
            else:
                tr = make_h_transfer(spaces[i - 1], sp, dtype)
        prev_trimmed = cur_trimmed
        levels.append(MGLevel(op=lop, smoother=sm, transfer=tr))
    levels, fine_trim = wire_trimmed(levels)
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=fine_trim, levels=tuple(levels))
    return mg, spaces


# --- 1. bf16-state smoother + cycle at r=6 --------------------------------
mg, spaces = build_bench_vcycle(6, state_dtype="bf16")
fine = spaces[-1]
b = jax.random.normal(jax.random.PRNGKey(1), fine.grid_shape, jnp.float32)
for d in range(3):
    f = mg.levels[-1].op.mask1[d]
    shp = [1, 1, 1]
    shp[d] = f.shape[0]
    b = b * f.reshape(shp)

sm6 = mg.levels[-1].smoother
g6 = tuple(s - 1 for s in fine.grid_shape)
u6 = jax.random.normal(jax.random.PRNGKey(4), g6, jnp.float32)
r6 = jax.random.normal(jax.random.PRNGKey(5), g6, jnp.float32)
probe("fine_fused_smooth_bf16", lambda: {
    "ms": measure_op(lambda u: sm6.smooth(u, r6), u6, repeats=3) * 1e3})

probe("vcycle_r6_bf16", lambda: {
    "ms": measure_op(mg.apply, b, iterations=(2, 6), repeats=3) * 1e3})
del mg

# --- 2. E2E solve on chip: iteration counts with bf16 state ---------------
def solve_r5():
    from portable_multigrid_tpu.models.poisson import GeometricMultigridPoisson

    prob = GeometricMultigridPoisson(3, 4, 5, dtype=jnp.float32,
                                     variant="auto")
    _, st = prob.solve(rtol=1e-5)
    return {"iterations": st.iterations, "converged": bool(st.converged),
            "l2": float(st.solution_l2_norm)}


probe("solve_r5_auto_bf16state", solve_r5)

# --- 3. lane-padded Q5 / Q7 kernel compiles -------------------------------
def zpad_bisect(p, r, cores=("banded", "mxu")):
    from portable_multigrid_tpu.ops.pallas_laplace import (
        PallasLaplaceOperator,
        make_laplace_auto,
    )

    sp = FESpace(HyperCubeMesh(3, r), p)
    out = {}
    for core in cores:
        try:
            op = make_laplace_auto(sp, jnp.float32, core=core, precision="high")
            if not isinstance(op, PallasLaplaceOperator):
                out[core] = f"not pallas: {type(op).__name__}"
                continue
            u = jnp.zeros(sp.grid_shape, jnp.float32)
            jax.jit(op.apply).lower(u).compile()
            out[core] = f"ok zpad={op.zpad} bx={op.bx} by={op.by}"
        except Exception as e:  # noqa: BLE001
            out[core] = repr(e)[:120]
    return out


probe("q5_r6_zpad_compile", lambda: zpad_bisect(5, 6))   # 320 -> 384 lanes
probe("q7_r5_zpad_compile", lambda: zpad_bisect(7, 5))   # 224 -> 256 lanes

# --- 4. bench-identical lines (records BENCH numbers) ---------------------
import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    os.environ["PMG_BENCH_DEGREE"] = env.pop("degree", "4")
    os.environ.setdefault("PMG_BENCH_VARIANT", "auto")
    for kk, v in env.items():
        os.environ[kk] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}),
              flush=True)


run_bench("r6_bf16state")
run_bench("r7_bf16state", r="7")
