"""Round-3 TPU batch 12: chebl/chebd benches + bf16 tiny-dot matrix for the
mega kernel.
"""

import json
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(tag, fn):
    try:
        fn()
        print(json.dumps({"case": tag, "ok": True}), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:120]}), flush=True)
        return False


def aot(f, *args):
    jax.jit(f).lower(*args).compile()


# --- bf16 dot matrix at mega shapes ---------------------------------------
def bdot(tag, pattern, shape, wshape, hilo):
    t3 = jnp.zeros(shape, jnp.float32)
    W = jnp.zeros(wshape, jnp.float32)

    def kern(a_r, w_r, o_r):
        a = a_r[...]
        w = w_r[...]

        def one(ah, wh):
            if pattern == "z":
                return jax.lax.dot_general(
                    ah, wh, (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if pattern == "x":
                return jax.lax.dot_general(
                    wh, ah, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            w3 = jnp.broadcast_to(wh[None], (ah.shape[0],) + wh.shape)
            return jax.lax.dot_general(
                w3, ah, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

        if hilo:
            ahi = a.astype(jnp.bfloat16)
            alo = (a - ahi.astype(jnp.float32)).astype(jnp.bfloat16)
            whi = w.astype(jnp.bfloat16)
            wlo = (w - whi.astype(jnp.float32)).astype(jnp.bfloat16)
            o_r[...] = one(ahi, whi) + one(alo, whi) + one(ahi, wlo)
        else:
            o_r[...] = one(a.astype(jnp.bfloat16), w.astype(jnp.bfloat16))

    oshape = (shape[0], shape[1], wshape[0]) if pattern == "z" else (
        (wshape[0], shape[1], shape[2]) if pattern == "x"
        else (shape[0], wshape[0], shape[2]))
    fn = pl.pallas_call(
        kern, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32))
    probe(tag, lambda: aot(lambda a, w: fn(a, w), t3, W))


for pat in ("z", "x", "y"):
    bdot(f"bf16_{pat}_32c_single", pat, (32, 32, 32), (32, 32), False)
    bdot(f"bf16_{pat}_32c_hilo", pat, (32, 32, 32), (32, 32), True)
bdot("bf16_x_32x32x128_hilo", "x", (32, 32, 128), (32, 32), True)
bdot("bf16_z_32x32x128_hilo", "z", (32, 32, 128), (128, 128), True)

# --- benches with the chebl/chebd modes -----------------------------------
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


run_bench("r6_chebl", PMG_BENCH_PALLAS_TRANSFER="1",
          PMG_BENCH_MEGA_COARSE="0")
run_bench("r7_chebl", r="7", PMG_BENCH_PALLAS_TRANSFER="1",
          PMG_BENCH_MEGA_COARSE="0")
