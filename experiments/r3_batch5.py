"""Round-3 TPU batch 5: structural stage-ladder for the restrict/mega
Mosaic crashes.

Self-contained copies of the two crashing kernel skeletons with a stage
knob; every stage is AOT-compiled (no data).  Stage ladders:

restrict:  s0 DMA window + slice-out             (skeleton)
           s1 + x contraction (plain dot)
           s2 + y contraction (broadcast+batched dot)
           s3 + z contraction                     (full kernel)

mega:      m0 copy + SMEM scalar read
           m1 + one kron apply (dots on [4,4,4])
           m2 + chebyshev loop (elementwise only, no dots)
           m3 + full cheb with dots               (full k=1 kernel)
"""

import functools
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
        print(json.dumps({"case": tag, "error": repr(e)[:160]}), flush=True)
        return False


def aot(f, *args):
    jax.jit(f).lower(*args).compile()


# --- restrict ladder ------------------------------------------------------
Nf, Nc, Zf, Zc = 256, 128, 256, 128
out_w, win_w = 32, 80
nb = Nc // out_w


def restrict_stage(stage):
    sx = jnp.asarray(np.clip(np.arange(nb) * 64 - 8, 0, Nf - win_w)
                     .astype(np.int32))
    mx = jnp.zeros((nb, out_w, win_w), jnp.bfloat16)
    mz_h = jnp.zeros((Zc, Zf), jnp.bfloat16)
    src = jnp.zeros((Nf, Nf, Zf), jnp.float32)

    def contract(t, w, axis, s2=False):
        hi = t.astype(jnp.bfloat16)
        if axis == 2:
            return jax.lax.dot_general(
                hi, w, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        if axis == 0:
            return jax.lax.dot_general(
                w, hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        w3 = jnp.broadcast_to(w[None], (t.shape[0],) + w.shape)
        return jax.lax.dot_general(
            w3, hi, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def kernel(src_hbm, sx_r, sy_r, mx_r, my_r, mz_r, out_r, win, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        x0 = sx_r[i]
        y0 = sy_r[j]
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(x0, win_w), pl.ds(y0, win_w), pl.ds(0, Zf)],
            win, sem)
        cp.start()
        cp.wait()
        t = win[...]
        if stage >= 1:
            t = contract(t, mx_r[0], 0)
        else:
            t = t[:out_w]
        if stage >= 2:
            t = contract(t, my_r[0], 1)
        else:
            t = t[:, :out_w]
        if stage >= 3:
            t = contract(t, mz_r[...], 2)
        else:
            t = t[:, :, :Zc]
        out_r[...] = t.astype(jnp.float32)

    out_spec = pl.BlockSpec((out_w, out_w, Zc), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    fn = pl.pallas_call(
        kernel,
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, out_w, win_w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_w, win_w), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Nc, Nc, Zc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win_w, win_w, Zf), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return functools.partial(fn, src, sx, sx, mx, mx, mz_h)


for s in (0, 1, 2, 3):
    probe(f"restrict_s{s}", lambda s=s: aot(restrict_stage(s)))

# --- mega ladder ----------------------------------------------------------
N = 8  # trimmed 4 is exotic; test both 4 and 8
for N in (4, 8):
    K = jnp.zeros((N, N), jnp.float32)
    idg = jnp.zeros((N, N, N), jnp.float32)
    scal = jnp.zeros((1, 2), jnp.float32)
    src = jnp.zeros((N, N, N), jnp.float32)

    def mega_stage(stage, N=N, K=K, idg=idg, scal=scal, src=src):
        def kernel(src_r, k_r, idg_r, scal_r, out_r):
            hi = jax.lax.Precision.HIGHEST

            def ap(u):
                t = jax.lax.dot_general(
                    u, k_r[...], (((2,), (1,)), ((), ())), precision=hi)
                w3 = jnp.broadcast_to(
                    k_r[...][None], (N,) + (N, N))
                t = jax.lax.dot_general(
                    w3, t, (((2,), (1,)), ((0,), (0,))), precision=hi)
                return jax.lax.dot_general(
                    k_r[...], t, (((1,), (0,)), ((), ())), precision=hi)

            theta = scal_r[0, 0]
            t = src_r[...]
            if stage == 0:
                out_r[...] = t * theta
                return
            if stage == 1:
                out_r[...] = ap(t)
                return
            x = t
            r = t
            for _ in range(3):
                if stage >= 3:
                    r = r - ap(x)
                else:
                    r = r - x * theta
                x = x + idg_r[...] * r
            out_r[...] = x

        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32),
        ), (src, K, idg, scal)

    for s in (0, 1, 2, 3):
        fn, args = mega_stage(s)
        probe(f"mega_N{N}_s{s}", lambda fn=fn, args=args: aot(
            lambda *a: fn(*a), *args))
