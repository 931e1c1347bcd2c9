"""Round-3 TPU batch 9: apply the crash fixes and measure everything.

Fixes in: select-based window starts (transfer kernels), hi/lo bf16 mega
contractions.  Probes the production kernel below 128 lanes (eligibility
monkeypatched), then runs the full benches with whatever works.
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


# --- fixed transfer kernels -----------------------------------------------
from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

sp6 = FESpace(HyperCubeMesh(3, 6), 4)
sp5 = FESpace(HyperCubeMesh(3, 5), 4)
t6 = tuple(s - 1 for s in sp6.grid_shape)
ut = jax.random.normal(jax.random.PRNGKey(0), t6, jnp.float32)
pt = make_pallas_h_transfer(sp5, sp6, jnp.float32, bf=16)
ok_r = probe("restrict_select_aot", lambda: aot(pt.restrict, ut))
if ok_r:
    probe("ptr_pair_bf16_r6", lambda: {
        "ms": measure_op(lambda v: pt.prolongate(pt.restrict(v)), ut,
                         repeats=3) * 1e3})
del pt

# --- hi/lo mega kernel ----------------------------------------------------
from portable_multigrid_tpu.ops.pallas_coarse import make_coarse_cycle

ok_mega = False
for k in (2, 5):
    tail = [FESpace(HyperCubeMesh(3, r), 4) for r in range(0, k)]
    kern = make_coarse_cycle(tail, jnp.float32)
    src = jax.random.normal(
        jax.random.PRNGKey(3),
        tuple(s - 1 for s in tail[-1].grid_shape), jnp.float32)
    ok_mega = probe(
        f"mega_hilo_k{k}",
        lambda kern=kern, src=src: {
            "ms": measure_op(kern.apply, src, repeats=2) * 1e3})
    del kern
    if not ok_mega:
        break

# --- production kernel below 128 lanes (monkeypatched eligibility) --------
import portable_multigrid_tpu.ops.pallas_laplace as PL

_orig = PL.pallas_eligible
PL.pallas_eligible = lambda space, bx=8, by=8: (
    space.dim == 3
    and space.mesh.cells_per_axis % bx == 0
    and space.mesh.cells_per_axis % by == 0
    and (bx * space.degree) % 8 == 0
    and (by * space.degree) % 8 == 0
)
try:
    for r, b in ((4, 16), (3, 8)):
        sp = FESpace(HyperCubeMesh(3, r), 4)
        op = PL.make_pallas_laplace(sp, jnp.float32, bx=b, by=b,
                                    core="banded")
        u = jnp.zeros(sp.grid_shape, jnp.float32)
        t = tuple(s - 1 for s in sp.grid_shape)
        du = jnp.zeros(t, jnp.float32)
        rr = jnp.zeros(t, jnp.float32)
        scal = jnp.asarray([1.1, 1.1], jnp.float32)
        probe(f"prod_r{r}_b{b}_apply", lambda op=op, u=u: aot(op.apply, u))
        mx = PL.make_pallas_laplace(sp, jnp.float32, bx=b, by=b, core="mxu")
        probe(f"prod_r{r}_b{b}_mxucheb",
              lambda mx=mx, du=du, rr=rr, scal=scal: aot(
                  lambda d, r_, x: mx._run("cheb", d, (r_, x), scal),
                  du, rr, rr))
        probe(f"prod_r{r}_b{b}_res3t",
              lambda op=op, du=du, rr=rr, scal=scal: aot(
                  lambda u_, r_: op._run("residual3t", u_, (r_,), scal),
                  du, rr))
finally:
    PL.pallas_eligible = _orig

# --- benches --------------------------------------------------------------
import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    for kk, v in env.items():
        os.environ[kk] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)


ptr = "1" if ok_r else "0"
mega = "1" if ok_mega else "0"
run_bench("r6_full", PMG_BENCH_PALLAS_TRANSFER=ptr,
          PMG_BENCH_MEGA_COARSE=mega)
run_bench("r7_full", r="7", PMG_BENCH_PALLAS_TRANSFER=ptr,
          PMG_BENCH_MEGA_COARSE=mega)
