"""Round-3 TPU batch 14b: remainder of batch 14 (which died on a missing
VCycle import after measuring vcycle_r6_mega = 21.57 ms — identical to the
non-mega 21.6 ms, so the ext<=32-capped mega tail buys nothing at r=6).

This run answers: where does the 21.6 ms go NOW (post transfer kernels)?
Plus the Q6 Mosaic-crash kernel bisect and the missing sweep benches.
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


def build_bench_vcycle(refinements, use_mega, mega_max_ext=32):
    from portable_multigrid_tpu.ops.pallas_laplace import (
        PallasLaplaceOperator,
        make_laplace_auto,
        make_resid3_twin,
        pallas_eligible,
    )
    from portable_multigrid_tpu.ops.pallas_transfer import make_h_transfer_auto
    from portable_multigrid_tpu.ops.transfer import make_h_transfer
    from portable_multigrid_tpu.solvers.chebyshev import make_chebyshev

    dtype = jnp.float32
    mesh = HyperCubeMesh(3, refinements)
    spaces = [FESpace(m, 4) for m in geometric_coarsening_sequence(mesh)]
    levels = []
    prev_trimmed = False
    cut = 0
    if use_mega:
        from portable_multigrid_tpu.ops.pallas_coarse import (
            CoarseCycleSmoother,
            make_coarse_cycle,
        )

        cut = next(
            (i for i, sp in enumerate(spaces)
             if pallas_eligible(sp) or pallas_eligible(sp, 16, 16)), 0)
        while cut > 0 and spaces[cut - 1].grid_shape[0] - 1 > mega_max_ext:
            cut -= 1
        if cut >= 2:
            kern = make_coarse_cycle(spaces[:cut], dtype)
            levels.append(MGLevel(
                op=None, smoother=CoarseCycleSmoother(kern=kern),
                transfer=None))
            prev_trimmed = True
        else:
            cut = 0
    for i, sp in list(enumerate(spaces))[cut:]:
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
                trimmed_io=fused is not None, resid3_op=resid3)
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


# --- 1. component profile of the production (nomega) r=6 V-cycle ----------
mg, spaces = build_bench_vcycle(6, use_mega=False)
fine = spaces[-1]
b = jax.random.normal(jax.random.PRNGKey(1), fine.grid_shape, jnp.float32)
for d in range(3):
    f = mg.levels[-1].op.mask1[d]
    shp = [1, 1, 1]
    shp[d] = f.shape[0]
    b = b * f.reshape(shp)
probe("vcycle_r6_nomega", lambda: {
    "ms": measure_op(mg.apply, b, iterations=(2, 6), repeats=3) * 1e3})

# the whole recursion below the fine level (levels r=0..5)
sub = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
             fine_trimmed=True, levels=mg.levels[:-1])
g5 = spaces[-2].grid_shape
b5 = jax.random.normal(jax.random.PRNGKey(2),
                       tuple(s - 1 for s in g5), jnp.float32)
top = len(sub.levels) - 1
probe("coarse_subcycle_r5", lambda: {
    "ms": measure_op(lambda v: sub._cycle(top, v), b5,
                     iterations=(2, 10), repeats=3) * 1e3})

# and the recursion below THAT (levels r=0..4): splits r=5 from the rest
sub4 = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
              fine_trimmed=True, levels=mg.levels[:-2])
g4 = spaces[-3].grid_shape
b4 = jax.random.normal(jax.random.PRNGKey(6),
                       tuple(s - 1 for s in g4), jnp.float32)
top4 = len(sub4.levels) - 1
probe("coarse_subcycle_r4", lambda: {
    "ms": measure_op(lambda v: sub4._cycle(top4, v), b4,
                     iterations=(2, 10), repeats=3) * 1e3})

# one fine fused smooth (the V-cycle runs 4: 2 pre + 2 post)
sm6 = mg.levels[-1].smoother
g6 = tuple(s - 1 for s in fine.grid_shape)
u6 = jax.random.normal(jax.random.PRNGKey(4), g6, jnp.float32)
r6 = jax.random.normal(jax.random.PRNGKey(5), g6, jnp.float32)
probe("fine_fused_smooth", lambda: {
    "ms": measure_op(lambda u: sm6.smooth(u, r6), u6, repeats=3) * 1e3})

# fine transfer pair (r5<->r6), in isolation
tr6 = mg.levels[-1].transfer
probe("fine_transfer_pair", lambda: {
    "ms": measure_op(lambda v: tr6.restrict(tr6.prolongate(v)), b5,
                     repeats=3) * 1e3})

# fine trimmed residual (residual1t: restriction prep)
probe("fine_residual1t", lambda: {
    "ms": measure_op(lambda u: sm6.residual(u, r6), u6, repeats=3) * 1e3})

del mg, sub, sub4

# --- 2. Q6 r=6 Mosaic-crash bisection -------------------------------------
def q6_bisect():
    from portable_multigrid_tpu.ops.pallas_laplace import (
        PallasLaplaceOperator,
        make_laplace_auto,
        make_resid3_twin,
    )
    from portable_multigrid_tpu.ops.pallas_transfer import (
        PallasTransfer,
        make_h_transfer_auto,
    )
    from portable_multigrid_tpu.solvers.chebyshev import FusedChebyshev

    sp_c = FESpace(HyperCubeMesh(3, 5), 6)
    sp = FESpace(HyperCubeMesh(3, 6), 6)
    dtype = jnp.float32
    op = make_laplace_auto(sp, dtype, precision="high")
    assert isinstance(op, PallasLaplaceOperator), type(op)
    fused = make_laplace_auto(sp, dtype, core="mxu")
    if not isinstance(fused, PallasLaplaceOperator):
        fused = None
        print(json.dumps({"case": "q6_mxu", "note": "ineligible"}),
              flush=True)
    resid3 = make_resid3_twin(sp, op, dtype) if fused is not None else None
    gt = tuple(s - 1 for s in sp.grid_shape)
    ut = jnp.zeros(gt, dtype)
    uf = jnp.zeros(sp.grid_shape, dtype)

    def aotc(f, *args):
        jax.jit(f).lower(*args).compile()
        return {}

    probe("q6_banded_apply", lambda: aotc(op.apply, uf))
    if fused is not None:
        probe("q6_mxu_apply", lambda: aotc(fused.apply, uf))
        sm = FusedChebyshev(
            degree=5, trimmed_io=True, op=op, op_smooth=fused,
            op_resid3=resid3, theta=jnp.float32(1.1),
            delta=jnp.float32(0.9))
        probe("q6_residual1t", lambda: aotc(sm.residual, ut, ut))
        probe("q6_smooth_resid3t_cheb", lambda: aotc(sm.smooth, ut, ut))
    tr = make_h_transfer_auto(sp_c, sp, dtype, True, True)
    if isinstance(tr, PallasTransfer):
        ct = jnp.zeros(tuple(s - 1 for s in sp_c.grid_shape), dtype)
        probe("q6_tr_prolongate", lambda: aotc(tr.prolongate, ct))
        probe("q6_tr_restrict", lambda: aotc(tr.restrict, ut))
    else:
        print(json.dumps({"case": "q6_transfer", "note": "not pallas"}),
              flush=True)


probe("q6_bisect", lambda: q6_bisect() or {})

# --- 3. missing sweep benches ---------------------------------------------
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
    os.environ.pop("PMG_BENCH_VARIANT", None)


run_bench("q6_r6_kron", degree="6", PMG_BENCH_VARIANT="kron")
run_bench("q1_r8_amortized", r="8", degree="1")
