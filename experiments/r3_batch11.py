"""Round-3 TPU batch 11: mega degree-ladder bisection + full benches with
the coarse-lane-eligibility fix (pallas transfers r6<->r5 only at Q4).
"""

import dataclasses
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

# degree ladder on k=1 (one level): deg 1 = pure elementwise (no dots);
# deg 2 = one hi/lo apply per cheb; then k=2 (adds transfers + recursion)
sp0 = [FESpace(HyperCubeMesh(3, 0), 4)]
src0 = jnp.zeros((4, 4, 4), jnp.float32)
kern0 = make_coarse_cycle(sp0, jnp.float32)
for deg in (1, 2, None):
    kd = kern0 if deg is None else dataclasses.replace(kern0,
                                                       degrees=(deg,))
    tag = f"mega_k1_deg{deg if deg else kern0.degrees[0]}"
    ok = probe(tag, lambda kd=kd: aot(kd.apply, src0))
    if not ok and deg == 1:
        break

sp1 = [FESpace(HyperCubeMesh(3, r), 4) for r in (0, 1)]
src1 = jnp.zeros((8, 8, 8), jnp.float32)
kern1 = make_coarse_cycle(sp1, jnp.float32)
ok_k2deg1 = probe("mega_k2_deg11", lambda: aot(
    dataclasses.replace(kern1, degrees=(1, 1)).apply, src1))
ok_k2 = probe("mega_k2_full", lambda: aot(kern1.apply, src1))

ok_mega = False
if ok_k2:
    sp5 = [FESpace(HyperCubeMesh(3, r), 4) for r in range(0, 5)]
    kern5 = make_coarse_cycle(sp5, jnp.float32)
    src5 = jax.random.normal(jax.random.PRNGKey(3), (64, 64, 64),
                             jnp.float32)
    ok_mega = probe("mega_k5_full", lambda: {
        "ms": measure_op(kern5.apply, src5, repeats=2) * 1e3})

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


mega = "1" if ok_mega else "0"
run_bench("r6_full", PMG_BENCH_PALLAS_TRANSFER="1",
          PMG_BENCH_MEGA_COARSE=mega)
run_bench("r7_full", r="7", PMG_BENCH_PALLAS_TRANSFER="1",
          PMG_BENCH_MEGA_COARSE=mega)
