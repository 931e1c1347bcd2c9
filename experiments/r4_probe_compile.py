"""Round-4 toolchain-envelope probe.

The 2026-08 compile-helper update changed the Mosaic pass: dim-1 (sublane)
DMA slice starts now need PROVABLE 8-divisibility (r=6 bench died inside the
transfer kernel with "Failed to prove that a tile index in dimension 1 is
divisible by the tiling (8)"), and the helper now returns REAL error text
instead of a silent exit-1.  Probe every production kernel family and print
one PASS/FAIL line each with the error head, so the round-3 empirical crash
envelope can be re-bisected against actual diagnostics.

Run: PYTHONPATH=/root/repo:/root/.axon_site python experiments/r4_probe_compile.py [set]
Sets: 1 = r6 Q4 production, 2 = r7 Q4, 3 = zpad Q5/Q7, 4 = Q6 crash list.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.ops.pallas_cheb2 import make_cheb2
from portable_multigrid_tpu.ops.pallas_transfer import make_pallas_h_transfer

f32 = jnp.float32
bf16 = jnp.bfloat16


def try_compile(tag, fn, args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"PASS {tag}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " | ")[:500]
        print(f"FAIL {tag}: {type(e).__name__}: {msg}", flush=True)
        return False


def sds(shape, dt=f32):
    return jax.ShapeDtypeStruct(shape, dt)


def probe_laplace(tag, sp, bx, by, core, zpad=None, sdtype="bf16",
                  modes=("apply", "residual3t")):
    try:
        op = make_pallas_laplace(sp, f32, bx=bx, by=by, core=core, zpad=zpad)
    except Exception as e:  # noqa: BLE001
        print(f"SKIP {tag}: builder: {e}", flush=True)
        return
    p = op.degree
    t = tuple(nn * p for nn in op.n[:2]) + (op.n[2] * p + op.zpad,)
    sd = bf16 if sdtype == "bf16" else f32
    scal = np.asarray([1.1, 0.7], np.float32)
    for mode in modes:
        if mode == "apply":
            try_compile(f"{tag}:apply", lambda u: op.apply(u),
                        (sds(op.grid_shape),))
        elif mode in ("residual3t", "residual1t"):
            try_compile(
                f"{tag}:{mode}",
                lambda u, r: op._run(mode, u, (r,), scal, sdtype=sdtype)
                if mode == "residual3t" else op._run(mode, u, (r,)),
                (sds(t), sds(t)),
            )
        else:  # cheb / chebl
            try_compile(
                f"{tag}:{mode}",
                lambda d, r, x: op._run(mode, d, (r, x), scal, sdtype=sdtype),
                (sds(t, sd), sds(t, sd), sds(t)),
            )


def probe_cheb2(tag, sp, bx, by, zpad=None, sdtype="bf16"):
    try:
        kern = make_cheb2(sp, f32, bx=bx, by=by, zpad=zpad)
    except Exception as e:  # noqa: BLE001
        print(f"SKIP {tag}: builder: {e}", flush=True)
        return
    p = kern.degree
    t = tuple(nn * p for nn in kern.n[:2]) + (kern.n[2] * p + kern.zpad,)
    sd = bf16 if sdtype == "bf16" else f32
    s4 = np.asarray([1.1, 0.7, 0.9, 0.5], np.float32)
    s5 = np.asarray([1.1, 0.7, 0.9, 0.5, 1.3], np.float32)
    try_compile(f"{tag}:cheb2f0",
                lambda b: kern.steps2(b, None, None, s5, "cheb2f0",
                                      sdtype=sdtype),
                (sds(t),))
    try_compile(f"{tag}:cheb2",
                lambda d, r, x: kern.steps2(d, r, x, s4, "cheb2",
                                            sdtype=sdtype),
                (sds(t, sd), sds(t, sd), sds(t)))
    try_compile(f"{tag}:cheb2l",
                lambda d, r, x: kern.steps2(d, r, x, s4, "cheb2l",
                                            sdtype=sdtype),
                (sds(t, sd), sds(t, sd), sds(t)))


def probe_transfer(tag, spc, spf):
    try:
        tr = make_pallas_h_transfer(spc, spf, f32)
    except Exception as e:  # noqa: BLE001
        print(f"SKIP {tag}: builder: {e}", flush=True)
        return
    try_compile(f"{tag}:restrict", lambda v: tr.restrict(v),
                (sds(tr.shape_f),))
    try_compile(f"{tag}:prolongate_add",
                lambda d, c: tr.prolongate_and_add(d, c),
                (sds(tr.shape_f), sds(tr.shape_c)))


def space(r, p):
    return FESpace(HyperCubeMesh(3, r), p)


which = sys.argv[1] if len(sys.argv) > 1 else "1"
print(f"devices: {jax.devices()}", flush=True)

if which == "1":  # r=6 Q4 production path
    sp6, sp5 = space(6, 4), space(5, 4)
    probe_transfer("tr_r6q4", sp5, sp6)
    probe_cheb2("cheb2_r6q4_16x16", sp6, 16, 16)
    probe_cheb2("cheb2_r6q4_8x8", sp6, 8, 8)
    probe_laplace("banded16_r6q4", sp6, 16, 16, "banded",
                  modes=("apply", "residual3t"))
    probe_laplace("mxu16_r6q4", sp6, 16, 16, "mxu", modes=("cheb", "chebl"))
    probe_laplace("banded8_r6q4_resid3", sp6, 8, 8, "banded",
                  modes=("residual3t", "residual1t"))
elif which == "2":  # r=7 Q4
    sp7, sp6, sp5 = space(7, 4), space(6, 4), space(5, 4)
    probe_transfer("tr_r7q4", sp6, sp7)
    probe_laplace("banded8_r7q4", sp7, 8, 8, "banded",
                  modes=("apply", "residual3t"))
    probe_laplace("mxu8_r7q4", sp7, 8, 8, "mxu", modes=("cheb", "chebl"))
    probe_cheb2("cheb2_r7q4_8x8", sp7, 8, 8)
elif which == "3":  # lane-padded Q5 r=6 (zpad 64) and Q7 r=5 (zpad 32)
    sq5 = space(6, 5)
    probe_laplace("banded8_q5r6_z64", sq5, 8, 8, "banded",
                  modes=("apply", "residual3t"))
    probe_laplace("mxu8_q5r6_z64", sq5, 8, 8, "mxu", modes=("cheb", "chebl"))
    probe_cheb2("cheb2_q5r6_z64_8x8", sq5, 8, 8)
    sq7 = space(5, 7)
    probe_laplace("banded8_q7r5_z32", sq7, 8, 8, "banded",
                  modes=("apply", "residual3t"))
    probe_cheb2("cheb2_q7r5_z32_8x8", sq7, 8, 8)
elif which == "4":  # Q6 crash list — now with real error text
    sq6 = space(6, 6)
    probe_laplace("banded8_q6r6", sq6, 8, 8, "banded", modes=("apply",))
    probe_laplace("mxu8_q6r6", sq6, 8, 8, "mxu", modes=("cheb",))
    probe_laplace("mxu3_8_q6r6", sq6, 8, 8, "mxu3", modes=("apply",))
elif which == "5":  # coarse sub-128-lane levels padded UP to 128 lanes —
    # if these compile, the whole r<=4 coarse tail rides the fused kernels
    # (the coarse-recursion lever: 5.3 ms / 17% of the r=6 cycle)
    sp4 = space(4, 4)  # 64 lanes -> zpad 64
    probe_laplace("banded8_r4q4_z64", sp4, 8, 8, "banded", zpad=64,
                  modes=("apply", "residual3t"))
    probe_laplace("mxu8_r4q4_z64", sp4, 8, 8, "mxu", zpad=64,
                  modes=("cheb", "chebl"))
    probe_cheb2("cheb2_r4q4_z64", sp4, 8, 8, zpad=64)
    sp3 = space(3, 4)  # 32 lanes -> zpad 96
    probe_laplace("banded8_r3q4_z96", sp3, 8, 8, "banded", zpad=96,
                  modes=("apply", "residual3t"))
    probe_laplace("mxu8_r3q4_z96", sp3, 8, 8, "mxu", zpad=96,
                  modes=("cheb", "chebl"))
    sp2 = space(2, 4)  # 16 lanes -> zpad 112; blocks: n=4 cells -> bx=4
    probe_laplace("banded4_r2q4_z112", sp2, 4, 4, "banded", zpad=112,
                  modes=("apply", "residual3t"))
elif which == "7":  # re-probe the round-3 "16x16 blocks @ >256 lanes"
    # crash rule at r=7 Q4 (512 lanes) — the 2026-08 toolchain changed the
    # Mosaic pass, and this cap is what holds r=7 at 8x8 blocks (0.887x)
    sp7 = space(7, 4)
    probe_laplace("banded16_r7q4", sp7, 16, 16, "banded",
                  modes=("apply", "residual3t"))
    probe_laplace("mxu16_r7q4", sp7, 16, 16, "mxu", modes=("cheb", "chebl"))
    probe_cheb2("cheb2_r7q4_16x16", sp7, 16, 16)
    probe_laplace("banded16x8_r7q4", sp7, 16, 8, "banded",
                  modes=("apply", "residual3t"))
    probe_cheb2("cheb2_r7q4_16x8", sp7, 16, 8)
elif which == "6":  # the in-VMEM mega coarse-cycle kernel was deleted in
    # round 5 (ops/pallas_coarse.py): zpad-up claimed its lever (VERDICT r4
    # weak 4), so there is nothing left to probe
    print("SKIP set 6: pallas_coarse removed (superseded by zpad-up)",
          flush=True)
print("probe done", flush=True)
