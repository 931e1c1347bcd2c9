"""Round-3 TPU batch 6: one-variable-at-a-time ladders.

restrict skeleton (s0 crashed with NO dots): vary window width, mats dtype,
mats presence, SMEM starts, out tile — against the prolongate-shaped
variant (48-wide windows) that is known to compile.

mega (dots crash, elementwise fine): which dot pattern — plain z/x dots,
the broadcast+batched y dot, or the transpose y dot?
"""

import json

import numpy as np
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


Nf, Zf = 256, 256


def skel(tag, win_w=80, out_w=32, Zc=128, mats="bf16", smem=True,
         n_mats=2):
    nb = 128 // out_w
    sx = jnp.asarray(np.clip(np.arange(nb) * (256 // nb) - 8, 0,
                             Nf - win_w).astype(np.int32))
    mdt = jnp.bfloat16 if mats == "bf16" else jnp.float32
    mx = jnp.zeros((nb, out_w, win_w), mdt)
    src = jnp.zeros((Nf, Nf, Zf), jnp.float32)

    def kernel(*refs):
        src_hbm = refs[0]
        pos = 1
        if smem:
            sx_r = refs[pos]
            pos += 1
        mrefs = refs[pos: pos + n_mats]
        pos += n_mats
        out_r = refs[pos]
        win, sem = refs[pos + 1:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        if smem:
            x0 = sx_r[i]
            y0 = sx_r[j]
        else:
            x0 = i * out_w * 2
            y0 = j * out_w * 2
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(x0, win_w), pl.ds(y0, win_w), pl.ds(0, Zf)],
            win, sem)
        cp.start()
        cp.wait()
        t = win[...]
        out_r[...] = t[:out_w, :out_w, :Zc]

    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [src]
    if smem:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(sx)
    for _ in range(n_mats):
        in_specs.append(pl.BlockSpec((1, out_w, win_w),
                                     lambda i, j: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(mx)
    fn = pl.pallas_call(
        kernel,
        grid=(nb, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_w, out_w, Zc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128, Zc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win_w, win_w, Zf), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    probe(tag, lambda: aot(lambda *a: fn(*a), *operands))


skel("skel_base80")                      # known-bad reference
skel("skel_w48", win_w=48)               # prolongate-ish width
skel("skel_w128", win_w=128)             # 128-aligned window
skel("skel_f32mats", mats="f32")
skel("skel_nomats", n_mats=0)
skel("skel_nosmem", smem=False)
skel("skel_out64", out_w=64)
skel("skel_Zc256", Zc=256)

# --- mega dot-pattern ladder ----------------------------------------------
N = 8
K = jnp.zeros((N, N), jnp.float32)
src3 = jnp.zeros((N, N, N), jnp.float32)
hi = jax.lax.Precision.HIGHEST


def mega_dot(tag, pattern):
    def kernel(src_r, k_r, out_r):
        t = src_r[...]
        w = k_r[...]
        if pattern == "z":
            t = jax.lax.dot_general(t, w, (((2,), (1,)), ((), ())),
                                    precision=hi)
        elif pattern == "x":
            t = jax.lax.dot_general(w, t, (((1,), (0,)), ((), ())),
                                    precision=hi)
        elif pattern == "ybatch":
            w3 = jnp.broadcast_to(w[None], (N, N, N))
            t = jax.lax.dot_general(w3, t, (((2,), (1,)), ((0,), (0,))),
                                    precision=hi)
        elif pattern == "ytranspose":
            t = jax.lax.dot_general(w, t, (((1,), (1,)), ((), ())),
                                    precision=hi).transpose(1, 0, 2)
        elif pattern == "zdef":
            t = jax.lax.dot_general(t, w, (((2,), (1,)), ((), ())),
                                    precision=jax.lax.Precision.DEFAULT)
        out_r[...] = t

    fn = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
    )
    probe(tag, lambda: aot(lambda a, w: fn(a, w), src3, K))


for pat in ("z", "x", "ybatch", "ytranspose", "zdef"):
    mega_dot(f"megadot_{pat}", pat)

# bigger shapes for the same patterns (is it the tiny N?)
N = 64
K = jnp.zeros((N, N), jnp.float32)
src3 = jnp.zeros((N, N, N), jnp.float32)
for pat in ("z", "ybatch", "ytranspose"):
    mega_dot(f"megadot64_{pat}", pat)
