"""Round-4 TPU batch 4: the two levers left after the sweep banked.

(a) PMG_ZPAD_UP=1 production bench at r=6 and r=7 Q4 — probe set 5 proved
    the whole r<=4 coarse tail (zpad-up to one 128-lane tile) compiles on
    the 2026-08 toolchain, so the coarse recursion (3.72 ms = 22% of the
    16.81 ms r=6 cycle) can ride the fused kernels.
(b) isolated 512-lane kernel timings at r=7 Q4: probe set 7 showed the
    round-3 "16x16 @ >256 lanes" Mosaic crash is GONE for the mxu core and
    the cheb2 pairs (banded still fails).  The r=7 fine level currently
    runs 8x8; if 16x16 (or 16x8) wins isolated, production wiring follows.
(c) in-context smooth slope post-cheb2 at r=6 (PMG_BENCH_SMOOTH_STEPS 2
    vs 3) — the round-4 V-cycle budget accounting.

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

import bench
from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32
bf16 = jnp.bfloat16


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
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)
    for kk in env:
        os.environ.pop(kk, None)


def probe(tag, fn):
    try:
        out = fn()
        rec = {"case": tag, "ok": True}
        if isinstance(out, dict):
            rec.update(out)
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:300]}), flush=True)


# --- (a) zpad-up coarse tail, production path ------------------------------
run_bench("q4_r6_zpad_up", PMG_ZPAD_UP="1")
run_bench("q4_r5_zpad_up_coarse_share", r="5", PMG_ZPAD_UP="1")
run_bench("q4_r7_zpad_up", r="7", PMG_ZPAD_UP="1")

# --- (b) isolated 512-lane kernels at r=7 Q4 -------------------------------
sp7 = FESpace(HyperCubeMesh(3, 7), 4)
t7 = tuple(s - 1 for s in sp7.grid_shape)  # (512, 512, 512)
scal2 = np.asarray([1.1, 0.7], np.float32)
s4 = np.asarray([1.1, 0.7, 0.9, 0.5], np.float32)


def time_cheb(bx, by):
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

    op = make_pallas_laplace(sp7, f32, bx=bx, by=by, core="mxu")
    d = jax.random.normal(jax.random.PRNGKey(0), t7, bf16)
    r = jax.random.normal(jax.random.PRNGKey(1), t7, bf16)
    x = jax.random.normal(jax.random.PRNGKey(2), t7, f32)
    f = jax.jit(lambda dd: op._run("cheb", dd, (r, x), scal2,
                                   sdtype="bf16")[0])
    f.lower(d).compile()
    ms = measure_op(f, d, repeats=3) * 1e3
    return {"ms": ms}


def time_cheb2(bx, by):
    from portable_multigrid_tpu.ops.pallas_cheb2 import make_cheb2

    kern = make_cheb2(sp7, f32, bx=bx, by=by)
    d = jax.random.normal(jax.random.PRNGKey(0), t7, bf16)
    r = jax.random.normal(jax.random.PRNGKey(1), t7, bf16)
    x = jax.random.normal(jax.random.PRNGKey(2), t7, f32)
    f = jax.jit(lambda dd: kern.steps2(dd, r, x, s4, "cheb2",
                                       sdtype="bf16")[0])
    f.lower(d).compile()
    ms = measure_op(f, d, repeats=3) * 1e3
    return {"ms_pair": ms}


probe("cheb_mxu_8x8_r7", lambda: time_cheb(8, 8))
probe("cheb_mxu_16x8_r7", lambda: time_cheb(16, 8))
probe("cheb_mxu_16x16_r7", lambda: time_cheb(16, 16))
probe("cheb2_8x8_r7", lambda: time_cheb2(8, 8))
probe("cheb2_16x8_r7", lambda: time_cheb2(16, 8))
probe("cheb2_16x16_r7", lambda: time_cheb2(16, 16))

# --- (c) post-cheb2 in-context smooth slope at r=6 -------------------------
run_bench("q4_r6_steps3", PMG_BENCH_SMOOTH_STEPS="3")
print("batch4 done", flush=True)
