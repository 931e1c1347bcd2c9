"""Round-3 TPU batch 4: AOT-compile bisection of the restrict + mega crashes.

Uses jit(...).lower().compile() so each probe costs one remote compile and
no data movement.  Goals:
  * which ingredient of the RESTRICT kernel crashes Mosaic (prolongate
    compiles and runs) — window width? out block? z-contraction direction?
  * does the 1-level mega kernel crash because of Precision.HIGHEST, tiny
    (<128) lane extents, or program size?
Then re-run the benches with whatever works (transfers restrict-less if
needed: PMG_BENCH_PALLAS_TRANSFER=0 fallback).
"""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace


def probe(tag, fn):
    try:
        fn()
        print(json.dumps({"case": tag, "ok": True}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:200]}), flush=True)
        return False


def aot(f, *args):
    jax.jit(f).lower(*args).compile()


# --- micro probes: in-kernel dot_general shapes ---------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def micro_dot(shape, wshape, prec, contract=((2,), (1,))):
    def kernel(a_r, w_r, o_r):
        o_r[...] = jax.lax.dot_general(
            a_r[...], w_r[...], (contract, ((), ())), precision=prec)

    oshape = shape[:2] + (wshape[0] if contract == ((2,), (1,)) else wshape[1],)
    a = jnp.zeros(shape, jnp.float32)
    w = jnp.zeros(wshape, jnp.float32)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
    ), (a, w)


H = jax.lax.Precision.HIGHEST
D = jax.lax.Precision.DEFAULT
for tag, shape, wshape, prec in (
    ("dot_4lane_highest", (4, 4, 4), (4, 4), H),
    ("dot_4lane_default", (4, 4, 4), (4, 4), D),
    ("dot_64lane_highest", (64, 64, 64), (64, 64), H),
    ("dot_256to128_highest", (32, 32, 256), (128, 256), H),
    ("dot_256to128_default", (32, 32, 256), (128, 256), D),
):
    fn, args = micro_dot(shape, wshape, prec)
    probe(tag, lambda fn=fn, args=args: aot(lambda a, w: fn(a, w), *args))

# --- restrict kernel bisection --------------------------------------------
from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

sp6 = FESpace(HyperCubeMesh(3, 6), 4)
sp5 = FESpace(HyperCubeMesh(3, 5), 4)
t6 = tuple(s - 1 for s in sp6.grid_shape)
ut = jnp.zeros(t6, jnp.float32)

pt16 = make_pallas_h_transfer(sp5, sp6, jnp.float32, bf=16)
ok16 = probe("restrict_bf16", lambda: aot(pt16.restrict, ut))
probe("prolongate_bf16", lambda: aot(
    pt16.prolongate, jnp.zeros(tuple(s - 1 for s in sp5.grid_shape),
                               jnp.float32)))
if not ok16:
    pt8 = make_pallas_h_transfer(sp5, sp6, jnp.float32, bf=8)
    ok8 = probe("restrict_bf8", lambda: aot(pt8.restrict, ut))
    # identity-z variant: isolate the z-contraction (replace the [128, 256]
    # z matrices with a padded square [256, 256] identity pair => Zo == Zi)
    if not ok8:
        Zf = t6[2]
        eye_h = jnp.asarray(np.eye(Zf, dtype=np.float32), jnp.bfloat16)
        eye_l = jnp.zeros((Zf, Zf), jnp.bfloat16)
        pt_id = dataclasses.replace(
            pt16,
            shape_c=(pt16.shape_c[0], pt16.shape_c[1], Zf),
            r_mats=pt16.r_mats[:4] + (eye_h, eye_l),
        )
        probe("restrict_bf16_zidentity", lambda: aot(pt_id.restrict, ut))

# --- mega kernel bisection ------------------------------------------------
from portable_multigrid_tpu.ops.pallas_coarse import make_coarse_cycle

for k in (1, 2, 3):
    tail = [FESpace(HyperCubeMesh(3, r), 4) for r in range(0, k)]
    src = jnp.zeros(tuple(s - 1 for s in tail[-1].grid_shape), jnp.float32)
    kern = make_coarse_cycle(tail, jnp.float32)
    okh = probe(f"mega_k{k}_highest", lambda: aot(kern.apply, src))
    if not okh:
        kd = dataclasses.replace(kern, precision="default")
        okd = probe(f"mega_k{k}_default", lambda: aot(kd.apply, src))
        if not okd:
            break
        break  # highest is the culprit; stop bisecting sizes

# --- benches: trimmed + twin, transfers per probe outcome ------------------
import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    os.environ["PMG_BENCH_MEGA_COARSE"] = "0"
    for kk, v in env.items():
        os.environ[kk] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)


ptr = "1" if ok16 else "0"
run_bench("r6_trimmed_twin", PMG_BENCH_PALLAS_TRANSFER=ptr)
run_bench("r7_trimmed_twin", r="7", PMG_BENCH_PALLAS_TRANSFER=ptr)
