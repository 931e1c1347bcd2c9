"""Round-3 TPU batch 17: (a) padded coarse tail — explicit-zpad pallas
operators on the r<=4 levels (n*p < 128 lanes padded to one full 128-lane
tile) so the hierarchy stays on fused kernels below r=5; (b) in-context
smooth cost via the pre/post-steps slope (the isolated bf16 smooth saved
0.57 ms but the composed cycle only moved 21.54 -> 21.40); (c) mxu3
(f32-faithful hi/lo MXU) residual kernels at 16x16 — the banded residual3t
needs an 8x8 twin at 256 lanes, mxu3 might not; (d) the 2D p-ladder r=7
coarse-level diagnostic (37 outer iterations vs O(10) expected: print the
adaptive Chebyshev degree and eig bounds actually computed in f32).
"""

import json

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


# --- (a0) compile probes: explicit-zpad sub-128-lane operators -------------
def pad128_compile(r, core):
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

    sp = FESpace(HyperCubeMesh(3, r), 4)
    n, p = sp.mesh.cells_per_axis, sp.degree
    zp = 128 - n * p
    b = min(n, 16)
    op = make_pallas_laplace(sp, jnp.float32, bx=b, by=b, core=core, zpad=zp)
    u = jnp.zeros(sp.grid_shape, jnp.float32)
    jax.jit(op.apply).lower(u).compile()
    return {"zpad": zp, "b": b}


probe("r4_pad128_banded", lambda: pad128_compile(4, "banded"))
probe("r4_pad128_mxu", lambda: pad128_compile(4, "mxu"))
probe("r3_pad128_banded", lambda: pad128_compile(3, "banded"))


def build_cycle(refinements, state_dtype="bf16", pad_tail=False,
                pre=2, post=2, resid_core=None):
    from portable_multigrid_tpu.ops.pallas_laplace import (
        PallasLaplaceOperator,
        make_laplace_auto,
        make_pallas_laplace,
        make_resid3_twin,
    )
    from portable_multigrid_tpu.ops.pallas_transfer import make_h_transfer_auto
    from portable_multigrid_tpu.ops.transfer import make_h_transfer
    from portable_multigrid_tpu.solvers.chebyshev import make_chebyshev

    dtype = jnp.float32
    degree = 4
    mesh = HyperCubeMesh(3, refinements)
    spaces = [FESpace(m, degree) for m in geometric_coarsening_sequence(mesh)]
    levels = []
    prev_trimmed = False
    for i, sp in enumerate(spaces):
        n, p = sp.mesh.cells_per_axis, sp.degree
        lop = make_laplace_auto(sp, dtype, precision="high")
        if (pad_tail and i > 0 and not isinstance(lop, PallasLaplaceOperator)
                and 0 < n * p < 128 and min(n, 16) * p % 8 == 0):
            b = min(n, 16)
            lop = make_pallas_laplace(
                sp, dtype, bx=b, by=b, core="banded", zpad=128 - n * p)
        fused = None
        if i > 0 and isinstance(lop, PallasLaplaceOperator):
            if lop.zpad and n * p < 128:
                fused = make_pallas_laplace(
                    sp, dtype, bx=lop.bx, by=lop.by, core="mxu",
                    zpad=lop.zpad)
            else:
                f = make_laplace_auto(sp, dtype, core="mxu")
                fused = f if isinstance(f, PallasLaplaceOperator) else None
        if i == 0:
            sm = make_chebyshev(lop, smoothing_range=1e-3, degree=None,
                                eig_cg_n_iterations=sp.n_dofs)
        else:
            resid3 = None
            if fused is not None:
                if resid_core is not None:
                    resid3 = make_pallas_laplace(
                        sp, dtype, bx=lop.bx, by=lop.by, core=resid_core,
                        zpad=lop.zpad)
                else:
                    resid3 = make_resid3_twin(sp, lop, dtype)
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
    mg = VCycle(pre_smoothing_steps=pre, post_smoothing_steps=post,
                fine_trimmed=fine_trim, levels=tuple(levels))
    return mg, spaces


def masked_rhs(mg, fine):
    b = jax.random.normal(jax.random.PRNGKey(1), fine.grid_shape, jnp.float32)
    for d in range(3):
        f = mg.levels[-1].op.mask1[d]
        shp = [1, 1, 1]
        shp[d] = f.shape[0]
        b = b * f.reshape(shp)
    return b


# --- (b) in-context smooth slope: pre/post (1,1) vs known (2,2)=21.40 ------
def cycle_ms(**kw):
    mg, spaces = build_cycle(6, **kw)
    b = masked_rhs(mg, spaces[-1])
    ms = measure_op(mg.apply, b, iterations=(2, 6), repeats=3) * 1e3
    # correctness canary: one apply, report output norm (finite, nonzero)
    y = mg.apply(b)
    nrm = float(jnp.linalg.norm(y.astype(jnp.float32)))
    del mg
    return {"ms": ms, "out_norm": nrm}


probe("vcycle_r6_pp11_bf16", lambda: cycle_ms(pre=1, post=1))

# --- (a) padded coarse tail in the full cycle ------------------------------
probe("vcycle_r6_padtail_bf16", lambda: cycle_ms(pad_tail=True))

# --- (c) mxu3 residual kernels at 16x16/256 lanes --------------------------
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

# if mxu3 residual works, a full cycle with resid_core="mxu3" (keeps 16x16
# everywhere — drops the 8x8 twin's ~+0.3 ms and stays f32-faithful)
probe("vcycle_r6_mxu3resid_bf16", lambda: cycle_ms(resid_core="mxu3"))

# --- (c2) Q6: banded crashes (p=6-specific, batch-14b) but mxu compiles —
# if the f32-faithful mxu3 core compiles at p=6 it can serve as Q6's exact
# operator (residuals/CG), unlocking the last silently-slow degree
def q6_mxu3_compile():
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

    sp = FESpace(HyperCubeMesh(3, 6), 6)
    op = make_pallas_laplace(sp, jnp.float32, bx=8, by=8, core="mxu3")
    u = jnp.zeros(sp.grid_shape, jnp.float32)
    jax.jit(op.apply).lower(u).compile()
    return {"lanes": 384}


probe("q6_r6_mxu3_apply_compile", q6_mxu3_compile)

# --- (d) 2D p-ladder coarse diagnostic at r=7 ------------------------------
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
