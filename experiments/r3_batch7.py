"""Round-3 TPU batch 7: confirm the no-SMEM transfer fix + x-dot size
threshold, then the full benches.

Batch-6 verdicts: SMEM-sourced DMA starts crash Mosaic (program-id
arithmetic compiles); in-kernel x-pattern dots crash at N=8 (z and
batched-y patterns fine at all sizes); 3D transposes always crash.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# --- x-pattern dot size threshold -----------------------------------------
hi = jax.lax.Precision.HIGHEST
for N in (16, 32, 64):
    K = jnp.zeros((N, N), jnp.float32)
    src3 = jnp.zeros((N, N, N), jnp.float32)

    def kern(src_r, k_r, out_r):
        out_r[...] = jax.lax.dot_general(
            k_r[...], src_r[...], (((1,), (0,)), ((), ())), precision=hi)

    fn = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
    )
    probe(f"megadot_x_N{N}",
          lambda fn=fn, a=src3, k=K: aot(lambda x, w: fn(x, w), a, k))

# --- fixed transfer kernels: compile + time -------------------------------
from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

sp6 = FESpace(HyperCubeMesh(3, 6), 4)
sp5 = FESpace(HyperCubeMesh(3, 5), 4)
t6 = tuple(s - 1 for s in sp6.grid_shape)
ut = jax.random.normal(jax.random.PRNGKey(0), t6, jnp.float32)
pt = make_pallas_h_transfer(sp5, sp6, jnp.float32, bf=16)
ok_r = probe("restrict_nosmem_aot", lambda: aot(pt.restrict, ut))
if ok_r:
    probe("ptr_pair_bf16_r6", lambda: {
        "ms": measure_op(lambda v: pt.prolongate(pt.restrict(v)), ut,
                         repeats=3) * 1e3})
del pt

# --- benches (mega still off until its fix lands) -------------------------
import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    os.environ["PMG_BENCH_MEGA_COARSE"] = env.pop("mega", "0")
    for kk, v in env.items():
        os.environ[kk] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)


ptr = "1" if ok_r else "0"
run_bench("r6_trimmed_ptr_twin", PMG_BENCH_PALLAS_TRANSFER=ptr)
run_bench("r7_trimmed_ptr_twin", r="7", PMG_BENCH_PALLAS_TRANSFER=ptr)
