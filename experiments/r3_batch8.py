"""Round-3 TPU batch 8: final crash disambiguation + sub-128-lane probe.

Open questions after batch 7:
  * restrict crash: the clamped start arithmetic, or the contractions at
    restrict dims?  (prolongate = same code, different dims, compiles)
  * does ANY x-pattern dot variant compile (f32 default / bf16 restrict
    dims / reshape-to-2D / batch-swap)?
  * does the PRODUCTION fused kernel compile below 128 lanes (r=4: Z=64,
    r=3: Z=32)?  If yes, the coarse-recursion lever needs no mega kernel at
    all — the fused trimmed pipeline just extends deeper.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace


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


# --- restrict skeleton: clamped starts vs dots ----------------------------
Nf, Zf, Zc = 256, 256, 128
out_w, win_w = 32, 80
nb = 128 // out_w


def skel(tag, clamp_starts, dots):
    mx = jnp.zeros((nb, out_w, win_w), jnp.bfloat16)
    mz = jnp.zeros((Zc, Zf), jnp.bfloat16)
    src = jnp.zeros((Nf, Nf, Zf), jnp.float32)

    def kernel(src_hbm, mx_r, my_r, mz_r, out_r, win, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)
        if clamp_starts:
            def start(idx):
                s = ((idx * (out_w * 2) - 8) // 8) * 8
                return jnp.maximum(0, jnp.minimum(s, Nf - win_w))

            x0, y0 = start(i), start(j)
        else:
            x0 = i * out_w * 2
            y0 = j * out_w * 2
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(x0, win_w), pl.ds(y0, win_w), pl.ds(0, Zf)],
            win, sem)
        cp.start()
        cp.wait()
        t = win[...]
        if dots:
            hi = t.astype(jnp.bfloat16)
            t = jax.lax.dot_general(
                mx_r[0], hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            hi = t.astype(jnp.bfloat16)
            w3 = jnp.broadcast_to(my_r[0][None], (out_w, out_w, win_w))
            t = jax.lax.dot_general(
                w3, hi, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            hi = t.astype(jnp.bfloat16)
            t = jax.lax.dot_general(
                hi, mz_r[...], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            t = t[:out_w, :out_w, :Zc]
        out_r[...] = t.astype(jnp.float32)

    fn = pl.pallas_call(
        kernel,
        grid=(nb, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, out_w, win_w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_w, win_w), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((out_w, out_w, Zc), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, 128, Zc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((win_w, win_w, Zf), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    probe(tag, lambda: aot(lambda *a: fn(*a), src, mx, mx, mz))


skel("skel_clampstarts_nodots", True, False)
skel("skel_simplestarts_dots", False, True)
skel("skel_clampstarts_dots", True, True)

# --- x-pattern micro variants ---------------------------------------------
for tag, mk in (
    ("x_f32_default_N32", lambda: (
        (32,), jax.lax.Precision.DEFAULT, jnp.float32)),
    ("x_bf16_restrictdims", None),
    ("x_reshape2d_highest", None),
    ("x_batchswap_bf16", None),
):
    if tag == "x_f32_default_N32":
        N = 32
        K = jnp.zeros((N, N), jnp.float32)
        t3 = jnp.zeros((N, N, N), jnp.float32)

        def kern(a_r, w_r, o_r):
            o_r[...] = jax.lax.dot_general(
                w_r[...], a_r[...], (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT)

        fn = pl.pallas_call(
            kern, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32))
        probe(tag, lambda fn=fn, a=t3, w=K: aot(lambda x, y: fn(x, y), a, w))
    elif tag == "x_bf16_restrictdims":
        W = jnp.zeros((32, 80), jnp.bfloat16)
        t3 = jnp.zeros((80, 80, 256), jnp.bfloat16)

        def kern(a_r, w_r, o_r):
            o_r[...] = jax.lax.dot_general(
                w_r[...], a_r[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        fn = pl.pallas_call(
            kern, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((32, 80, 256), jnp.float32))
        probe(tag, lambda fn=fn, a=t3, w=W: aot(lambda x, y: fn(x, y), a, w))
    elif tag == "x_reshape2d_highest":
        N = 32
        K = jnp.zeros((N, N), jnp.float32)
        t3 = jnp.zeros((N, N, N), jnp.float32)

        def kern(a_r, w_r, o_r):
            t2 = a_r[...].reshape(N, N * N)
            r = jax.lax.dot_general(
                w_r[...], t2, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)
            o_r[...] = r.reshape(N, N, N)

        fn = pl.pallas_call(
            kern, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32))
        probe(tag, lambda fn=fn, a=t3, w=K: aot(lambda x, y: fn(x, y), a, w))
    else:  # batch-swap: contract axis 0, batch over axis 1
        N = 32
        W3 = jnp.zeros((N, N, N), jnp.bfloat16)  # [Y, Xo, X]
        t3 = jnp.zeros((N, N, N), jnp.bfloat16)  # [X, Y, Z]

        def kern(a_r, w_r, o_r):
            o_r[...] = jax.lax.dot_general(
                w_r[...], a_r[...], (((2,), (0,)), ((0,), (1,))),
                preferred_element_type=jnp.float32)

        fn = pl.pallas_call(
            kern, in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, N, N), jnp.float32))
        probe(tag, lambda fn=fn, a=t3, w=W3: aot(lambda x, y: fn(x, y), a, w))

# --- production fused kernel below 128 lanes ------------------------------
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

for r, b in ((4, 16), (4, 8), (3, 8)):
    sp = FESpace(HyperCubeMesh(3, r), 4)
    try:
        op = make_pallas_laplace(sp, jnp.float32, bx=b, by=b, core="banded",
                                 interpret=False)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": f"prod_r{r}_b{b}", "error": repr(e)[:120]}),
              flush=True)
        continue
    u = jnp.zeros(sp.grid_shape, jnp.float32)
    t = tuple(s - 1 for s in sp.grid_shape)
    du = jnp.zeros(t, jnp.float32)
    rr = jnp.zeros(t, jnp.float32)
    scal = jnp.asarray([1.1, 1.1], jnp.float32)
    probe(f"prod_r{r}_b{b}_apply", lambda op=op, u=u: aot(op.apply, u))
    probe(f"prod_r{r}_b{b}_cheb",
          lambda op=op, du=du, rr=rr, scal=scal: aot(
              lambda d, r_, x: op._run("cheb", d, (r_, x), scal),
              du, rr, rr))
    mx = make_pallas_laplace(sp, jnp.float32, bx=b, by=b, core="mxu")
    probe(f"prod_r{r}_b{b}_mxucheb",
          lambda mx=mx, du=du, rr=rr, scal=scal: aot(
              lambda d, r_, x: mx._run("cheb", d, (r_, x), scal),
              du, rr, rr))
    probe(f"prod_r{r}_b{b}_res3t",
          lambda op=op, du=du, rr=rr, scal=scal: aot(
              lambda u_, r_: op._run("residual3t", u_, (r_,), scal),
              du, rr))
