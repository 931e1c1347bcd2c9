"""Standalone experiment: fused Pallas vmult kernel (3D, Kronecker-local).

One HBM read + one HBM write per apply: per-block Kronecker-local operator
application entirely in VMEM, with carry planes resolving the overlap-add
across the sequential grid.  Dirichlet masks are folded into the 1D matrices
(z on the host, x/y in-kernel via iota masking at domain-edge blocks).

Validates against the XLA kron-variant apply and measures throughput.
Run on TPU:  python experiments/pallas_vmult.py [--check] [--bench]
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.laplace import assembled_1d_matrices, make_laplace


def build(space, dtype=jnp.float32, bx=8, by=8, precision="highest"):
    p = space.degree
    n = space.mesh.cells_per_axis
    N = space.points_per_axis
    assert n % bx == 0 and n % by == 0
    X = bx * p + 1
    Y = by * p + 1
    Z = N
    nbi, nbj = n // bx, n // by

    K1, M1 = assembled_1d_matrices(space)
    m1 = space.free_mask_1d()

    def local_1d(b):
        w = b * p + 1
        return K1[:w, :w].copy(), M1[:w, :w].copy()

    Kxh, Mxh = local_1d(bx)
    Kyh, Myh = local_1d(by)
    # z-masks folded on the host (z is never blocked)
    Kz = jnp.asarray(m1[:, None] * K1 * m1[None, :], dtype)
    Mz = jnp.asarray(m1[:, None] * M1 * m1[None, :], dtype)
    Kx = jnp.asarray(Kxh, dtype)
    Mx = jnp.asarray(Mxh, dtype)
    Ky = jnp.asarray(Kyh, dtype)
    My = jnp.asarray(Myh, dtype)

    def edge_mask(W, idx, nb):
        """Zero first row+col at the first block / last row+col at the last
        block: folds the global Dirichlet mask into the local 1D matrix."""
        L = W.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        keep_first = jnp.logical_or(idx > 0, jnp.logical_and(r > 0, c > 0))
        keep_last = jnp.logical_or(
            idx < nb - 1, jnp.logical_and(r < L - 1, c < L - 1)
        )
        return jnp.where(jnp.logical_and(keep_first, keep_last), W, 0.0)

    def kernel(u_hbm, Kz_r, Mz_r, Kx_r, Mx_r, Ky_r, My_r, out_hbm,
               slab, outs, carry_y, carry_x, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)

        cin = pltpu.make_async_copy(
            u_hbm.at[pl.ds(i * bx * p, X), pl.ds(j * by * p, Y), :],
            slab, sems.at[0],
        )
        cin.start()
        cin.wait()

        Kxm = edge_mask(Kx_r[:, :], i, nbi)
        Mxm = edge_mask(Mx_r[:, :], i, nbi)
        Kym = edge_mask(Ky_r[:, :], j, nbj)
        Mym = edge_mask(My_r[:, :], j, nbj)

        dot2 = partial(jnp.dot, precision=precision,
                       preferred_element_type=dtype)

        flat = slab[:, :, :].reshape(X * Y, Z)
        b = dot2(flat, Mz_r[:, :]).reshape(X, Y, Z)
        a = dot2(flat, Kz_r[:, :]).reshape(X, Y, Z)
        bT = b.transpose(1, 0, 2).reshape(Y, X * Z)
        aT = a.transpose(1, 0, 2).reshape(Y, X * Z)
        c1T = dot2(Mym, bT)
        c2T = dot2(Kym, bT) + dot2(Mym, aT)
        c1 = c1T.reshape(Y, X, Z).transpose(1, 0, 2).reshape(X, Y * Z)
        c2 = c2T.reshape(Y, X, Z).transpose(1, 0, 2).reshape(X, Y * Z)
        raw = (dot2(Kxm, c1) + dot2(Mxm, c2)).reshape(X, Y, Z)

        # ---- carries (raw contributions only; static-size slots) ----
        wbuf = jax.lax.rem(i, 2)
        rbuf = 1 - wbuf
        carry_x[wbuf, j] = raw[X - 1]
        tmp_cy = raw[:, Y - 1, :]

        cy = jnp.where(j > 0, carry_y[:, :], jnp.zeros_like(carry_y))
        carry_y[:, :] = tmp_cy

        seg = carry_x[rbuf, j]  # [Y, Z]; rows 0..Y-2 feed this block
        prev_last = carry_x[rbuf, jnp.maximum(j - 1, 0)][Y - 1 : Y, :]
        cx = seg[: Y - 1, :]
        cx_row0 = cx[:1, :] + jnp.where(j > 0, prev_last, jnp.zeros_like(prev_last))
        cx = jnp.concatenate([cx_row0, cx[1:, :]], axis=0)
        cx = jnp.where(i > 0, cx, jnp.zeros_like(cx))

        outv = raw[: X - 1, : Y - 1, :]
        plane_y0 = outv[:, :1, :] + cy[: X - 1][:, None, :]
        outv = jnp.concatenate([plane_y0, outv[:, 1:, :]], axis=1)
        plane_x0 = outv[:1, :, :] + cx[None, :, :]
        outv = jnp.concatenate([plane_x0, outv[1:, :, :]], axis=0)

        outs[:, :, :] = outv
        cout = pltpu.make_async_copy(
            outs,
            out_hbm.at[pl.ds(i * bx * p, X - 1), pl.ds(j * by * p, Y - 1), :],
            sems.at[1],
        )
        cout.start()
        cout.wait()

    grid = (nbi, nbj)
    inner = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, N, N), dtype),
        scratch_shapes=[
            pltpu.VMEM((X, Y, Z), dtype),
            pltpu.VMEM((X - 1, Y - 1, Z), dtype),
            pltpu.VMEM((X, Z), dtype),
            pltpu.VMEM((2, nbj, Y, Z), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )

    maskg = jnp.asarray(space.free_mask(), dtype)

    @jax.jit
    def apply(u):
        au = inner(u, Kz, Mz, Kx, Mx, Ky, My)
        # unwritten global last planes + Dirichlet faces: out = u there
        au = au.at[-1, :, :].set(0.0).at[:, -1, :].set(0.0)
        return maskg * au + (1.0 - maskg) * u

    return apply


def main():
    check = "--check" in sys.argv
    bench = "--bench" in sys.argv
    if check:
        sp = FESpace(HyperCubeMesh(3, 4), 4)  # 16^3 cells, N=65
        op = make_laplace(sp, jnp.float32, variant="kron")
        u = jnp.asarray(
            np.random.default_rng(0).standard_normal(sp.grid_shape), jnp.float32
        )
        want = np.asarray(jax.jit(op.apply)(u))
        for bx in (2, 4):
            f = build(sp, jnp.float32, bx=bx, by=bx)
            got = np.asarray(f(u))
            err = np.abs(got - want).max() / np.abs(want).max()
            print(f"bx={bx} rel err: {err}")
            assert err < 1e-5, err
        print("CHECK OK")
    if bench:
        sp = FESpace(HyperCubeMesh(3, 6), 4)
        for bx in (4, 8):
            for prec in ("highest", "default"):
                f = build(sp, jnp.float32, bx=bx, by=bx, precision=prec)
                u = jnp.asarray(
                    np.random.default_rng(0).standard_normal(sp.grid_shape),
                    jnp.float32,
                )
                ts = {}
                for n in (2, 8):
                    @jax.jit
                    def loop(v, n=n):
                        y = jax.lax.fori_loop(0, n, lambda k, w: f(w), v)
                        return jnp.sum(y.ravel()[:1])
                    float(loop(u))
                    t0 = time.perf_counter()
                    float(loop(u))
                    ts[n] = time.perf_counter() - t0
                dt = (ts[8] - ts[2]) / 6
                print(
                    f"bx={bx} prec={prec}: {dt*1e3:.3f} ms "
                    f"({sp.n_dofs/dt/1e9:.2f} GDoF/s)", flush=True
                )


if __name__ == "__main__":
    main()
