"""Round-3 TPU batch 10: padded-frame transfer kernels + P1T mega kernel
on hardware, then the full benches with every working lever enabled.
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


from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

sp6 = FESpace(HyperCubeMesh(3, 6), 4)
sp5 = FESpace(HyperCubeMesh(3, 5), 4)
t6 = tuple(s - 1 for s in sp6.grid_shape)
ut = jax.random.normal(jax.random.PRNGKey(0), t6, jnp.float32)
pt = make_pallas_h_transfer(sp5, sp6, jnp.float32, bf=16)
ok_r = probe("restrict_padded_aot", lambda: aot(pt.restrict, ut))
ok_p = probe("prolongate_padded_aot", lambda: aot(
    pt.prolongate, jnp.zeros(tuple(s - 1 for s in sp5.grid_shape),
                             jnp.float32)))
ok_ptr = ok_r and ok_p
if ok_ptr:
    probe("ptr_pair_bf16_r6", lambda: {
        "ms": measure_op(lambda v: pt.prolongate(pt.restrict(v)), ut,
                         repeats=3) * 1e3})
del pt

from portable_multigrid_tpu.ops.pallas_coarse import make_coarse_cycle

ok_mega = False
for k in (2, 5):
    tail = [FESpace(HyperCubeMesh(3, r), 4) for r in range(0, k)]
    kern = make_coarse_cycle(tail, jnp.float32)
    src = jax.random.normal(
        jax.random.PRNGKey(3),
        tuple(s - 1 for s in tail[-1].grid_shape), jnp.float32)
    ok_mega = probe(
        f"mega_p1t_k{k}",
        lambda kern=kern, src=src: {
            "ms": measure_op(kern.apply, src, repeats=2) * 1e3})
    del kern
    if not ok_mega:
        break

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


ptr = "1" if ok_ptr else "0"
mega = "1" if ok_mega else "0"
run_bench("r6_full", PMG_BENCH_PALLAS_TRANSFER=ptr,
          PMG_BENCH_MEGA_COARSE=mega)
run_bench("r7_full", r="7", PMG_BENCH_PALLAS_TRANSFER=ptr,
          PMG_BENCH_MEGA_COARSE=mega)
