"""Round-3 TPU batch 19: the cheb2 two-step fused Chebyshev kernel on chip.

(a) compile probes at (16,8)/(8,8)/(16,16) blocks, r=6 Q4;
(b) pair micro-bench: one cheb2 launch vs two single "cheb" launches;
(c) full production V-cycle r=6 with/without cheb2 (bench.py composition);
(d) solver-count canary: r=5 Q4 production solve, cheb2 on/off — CG
    iterations must be EQUAL;
(e) the lost batch-17 probes: mxu3 residual3t at 16x16, full cycle with
    resid_core="mxu3", Q6 mxu3 apply compile, 2D p-ladder coarse diag.

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
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
        print(json.dumps({"case": tag, "error": repr(e)[:300]}), flush=True)
        return False


# --- (a) compile probes ----------------------------------------------------
def cheb2_compile(bx, by, r=6, p=4, sdtype="bf16"):
    from portable_multigrid_tpu.ops.pallas_cheb2 import make_cheb2

    sp = FESpace(HyperCubeMesh(3, r), p)
    k2 = make_cheb2(sp, jnp.float32, bx=bx, by=by)
    g = tuple(s - 1 for s in sp.grid_shape)
    sd = jnp.bfloat16 if sdtype == "bf16" else jnp.float32
    d = jnp.zeros(g, sd)
    rr = jnp.zeros(g, sd)
    x = jnp.zeros(g, jnp.float32)
    scal = jnp.asarray([0.5, 0.25, 0.5, 0.25], jnp.float32)
    f = jax.jit(lambda dd: k2.steps2(dd, rr, x, scal, "cheb2",
                                     sdtype=sdtype)[1])
    f.lower(d).compile()
    return {"bx": bx, "by": by}


probe("cheb2_compile_16x8", lambda: cheb2_compile(16, 8))
ok_88 = probe("cheb2_compile_8x8", lambda: cheb2_compile(8, 8))
probe("cheb2_compile_16x16", lambda: cheb2_compile(16, 16))
# r=7 (512 lanes): the auto pick is (16, 8); a crash here means the r=7
# V-cycle silently loses cheb2 through bench.py's fallback ladder
probe("cheb2_compile_16x8_r7", lambda: cheb2_compile(16, 8, r=7))


def cheb2f0_compile(bx, by, r=6, p=4):
    from portable_multigrid_tpu.ops.pallas_cheb2 import make_cheb2

    sp = FESpace(HyperCubeMesh(3, r), p)
    k2 = make_cheb2(sp, jnp.float32, bx=bx, by=by)
    g = tuple(s - 1 for s in sp.grid_shape)
    b = jnp.zeros(g, jnp.float32)
    scal = jnp.asarray([0.5, 0.25, 0.5, 0.25, 1.1], jnp.float32)
    f = jax.jit(lambda bb: k2.steps2(bb, None, None, scal, "cheb2f0",
                                     sdtype="bf16")[1])
    f.lower(b).compile()
    return {"bx": bx, "by": by}


probe("cheb2f0_compile_16x8", lambda: cheb2f0_compile(16, 8))
probe("cheb2f0_compile_8x8", lambda: cheb2f0_compile(8, 8))


# --- (a2) branch-fetched transfer kernels: compile + pair timing -----------
def transfer_pair(r=6, p=4):
    from portable_multigrid_tpu.fem.mesh import geometric_coarsening_sequence
    from portable_multigrid_tpu.ops.pallas_transfer import (
        make_pallas_h_transfer,
    )

    mesh = HyperCubeMesh(3, r)
    spaces = [FESpace(m, p) for m in geometric_coarsening_sequence(mesh)]
    tr = make_pallas_h_transfer(spaces[-2], spaces[-1], jnp.float32)
    g = tuple(s - 1 for s in spaces[-1].grid_shape)
    f = jax.random.normal(jax.random.PRNGKey(0), g, jnp.float32)
    pair = jax.jit(lambda v: tr.prolongate(tr.restrict(v)))
    pair.lower(f).compile()
    ms = measure_op(pair, f, repeats=3) * 1e3
    return {"ms_pair": ms}


probe("transfer_pair_r6_branchfetch", transfer_pair)


# --- (a3) residual3t banded at 16x8 (the 8x8 twin costs ~+0.3 ms) ----------
def resid3t_16x8():
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

    sp = FESpace(HyperCubeMesh(3, 6), 4)
    op = make_pallas_laplace(sp, jnp.float32, bx=16, by=8, core="banded")
    g = tuple(s - 1 for s in sp.grid_shape)
    u = jax.random.normal(jax.random.PRNGKey(2), g, jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(3), g, jnp.float32)
    scal = jnp.stack([jnp.float32(1.1), jnp.float32(1.1)])
    f = jax.jit(lambda uu: op._run("residual3t", uu, (rhs,), scal,
                                   sdtype="bf16")[2])
    f.lower(u).compile()
    ms = measure_op(lambda uu: f(uu), u, repeats=3) * 1e3
    return {"ms_residual3t_16x8_banded": ms}


probe("resid3t_16x8_banded", resid3t_16x8)


# --- (b) pair micro-bench --------------------------------------------------
def cheb2_pair_ms(bx, by, r=6, p=4, sdtype="bf16"):
    from portable_multigrid_tpu.ops.pallas_cheb2 import make_cheb2
    from portable_multigrid_tpu.ops.pallas_laplace import make_laplace_auto

    sp = FESpace(HyperCubeMesh(3, r), p)
    k2 = make_cheb2(sp, jnp.float32, bx=bx, by=by)
    mxu = make_laplace_auto(sp, jnp.float32, core="mxu")
    g = tuple(s - 1 for s in sp.grid_shape)
    sd = jnp.bfloat16 if sdtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, g, jnp.float32).astype(sd)
    rr = jax.random.normal(jax.random.PRNGKey(1), g, jnp.float32).astype(sd)
    x = jax.random.normal(jax.random.PRNGKey(2), g, jnp.float32)
    scal4 = jnp.asarray([0.5, 0.25, 0.5, 0.25], jnp.float32)
    scal2 = jnp.asarray([0.5, 0.25], jnp.float32)

    pair = jax.jit(lambda dd: k2.steps2(dd, rr, x, scal4, "cheb2",
                                        sdtype=sdtype)[1])
    ms_pair = measure_op(pair, d, repeats=3) * 1e3

    def two_singles(dd):
        r1, d1, x1 = mxu._run("cheb", dd, (rr, x), scal2, sdtype=sdtype)
        return mxu._run("cheb", d1, (r1, x1), scal2, sdtype=sdtype)[1]

    ms_two = measure_op(jax.jit(two_singles), d, repeats=3) * 1e3
    # numeric canary: pair vs two singles agree to recurrence-state scale
    import numpy as np

    a = np.asarray(pair(d), np.float32)
    b = np.asarray(jax.jit(two_singles)(d), np.float32)
    rel = float(np.abs(a - b).max() / (np.abs(a).max() + 1e-30))
    return {"ms_pair": ms_pair, "ms_two_singles": ms_two, "rel_diff": rel}


probe("cheb2_pair_16x8", lambda: cheb2_pair_ms(16, 8))
probe("cheb2_pair_8x8", lambda: cheb2_pair_ms(8, 8))
probe("cheb2_pair_16x16", lambda: cheb2_pair_ms(16, 16))


# --- (c) full production V-cycle with/without cheb2 ------------------------
def vcycle_ms(r, cheb2_on, extra_env=()):
    os.environ["PMG_BENCH_REFINEMENTS"] = str(r)
    os.environ["PMG_BENCH_CHEB2"] = "1" if cheb2_on else "0"
    for k, v in extra_env:
        os.environ[k] = v
    import importlib

    import bench

    importlib.reload(bench)
    bench.main()
    return {}


probe("vcycle_r6_cheb2", lambda: vcycle_ms(6, True))
probe("vcycle_r6_nocheb2", lambda: vcycle_ms(6, False))
probe("vcycle_r7_cheb2", lambda: vcycle_ms(7, True))


# --- (d) solver-count canary ----------------------------------------------
def solve_counts(cheb2_on):
    os.environ["PMG_CHEB2"] = "1" if cheb2_on else "0"
    from portable_multigrid_tpu.models.poisson import GeometricMultigridPoisson

    prob = GeometricMultigridPoisson(3, 4, 5, dtype=jnp.float32,
                                     variant="auto")
    _, st = prob.solve(rtol=1e-6)
    return {"iterations": st.iterations,
            "l2": float(st.solution_l2_norm)}


probe("solve_r5_cheb2_on", lambda: solve_counts(True))
probe("solve_r5_cheb2_off", lambda: solve_counts(False))


# --- (e) lost batch-17 probes ---------------------------------------------
def mxu3_resid_probe():
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

    sp = FESpace(HyperCubeMesh(3, 6), 4)
    op = make_pallas_laplace(sp, jnp.float32, bx=16, by=16, core="mxu3")
    g = tuple(s - 1 for s in sp.grid_shape)
    u = jax.random.normal(jax.random.PRNGKey(2), sp.grid_shape, jnp.float32)
    rhs = jax.random.normal(jax.random.PRNGKey(3), g, jnp.float32)
    scal = jnp.stack([jnp.float32(1.1), jnp.float32(1.1)])
    f = jax.jit(lambda uu: op._run("residual3t", uu, (rhs,), scal)[2])
    f.lower(u).compile()
    ms = measure_op(lambda uu: f(uu), u, repeats=3) * 1e3
    return {"ms_residual3t_16x16_mxu3": ms}


probe("mxu3_residual3t_16x16", mxu3_resid_probe)


def q6_mxu3_compile():
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

    sp = FESpace(HyperCubeMesh(3, 6), 6)
    op = make_pallas_laplace(sp, jnp.float32, bx=8, by=8, core="mxu3")
    u = jnp.zeros(sp.grid_shape, jnp.float32)
    jax.jit(op.apply).lower(u).compile()
    return {"lanes": 384}


probe("q6_r6_mxu3_apply_compile", q6_mxu3_compile)


def pladder_diag():
    from portable_multigrid_tpu.models.poisson import PolynomialMultigridPoisson

    prob = PolynomialMultigridPoisson(2, 7, 7, dtype=jnp.float32,
                                      variant="kron")
    out = {}
    for i, lvl in enumerate(prob.levels):
        sm = lvl.smoother
        out[f"L{i}"] = {
            "degree": int(sm.degree),
            "theta": float(jnp.asarray(sm.theta)),
            "delta": float(jnp.asarray(sm.delta)),
        }
    _, st = prob.solve(rtol=1e-5)
    out["iterations"] = st.iterations
    return out


probe("pladder_r7_coarse_diag", pladder_diag)
