"""Batched kernel-variant experiments: measure several fused-apply designs
in one TPU session (remote compiles are slow; batch everything).

Variants:
  roll      — banded rolls on all axes (current production kernel)
  roll16    — same with 16x16 cell blocks
  zmxu-*    — z-pass as an in-VMEM MXU matmul (precision high/default),
              banded rolls for x/y
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.laplace import assembled_1d_matrices
from portable_multigrid_tpu.ops.pallas_laplace import (
    make_pallas_laplace,
    to_bands,
)
from portable_multigrid_tpu.fem.basis import make_basis


def build_zmxu(space, dtype=jnp.float32, bx=8, by=8, zprec="high"):
    """Variant: z-contractions on the MXU (dense [Z,Z] matrices in VMEM),
    x/y via banded rolls."""
    p = space.degree
    n = space.mesh.cells_per_axis
    N = space.points_per_axis
    X, Y, Z = bx * p + 1, by * p + 1, n * p
    nbi, nbj = n // bx, n // by
    byp = by * p
    nb = 2 * p + 1

    K1, M1 = assembled_1d_matrices(space)
    m1 = space.free_mask_1d()
    b = make_basis(p)
    W = np.diag(b.q_weights)
    Kc = (b.D.T @ W @ b.D) / space.mesh.h
    Mc = (b.B.T @ W @ b.B) * space.mesh.h

    def local_1d(blk):
        w = blk * p + 1
        K = np.zeros((w, w))
        M = np.zeros((w, w))
        for c in range(blk):
            sl = slice(c * p, c * p + p + 1)
            K[sl, sl] += Kc
            M[sl, sl] += Mc
        return K, M

    Kz = jnp.asarray((m1[:, None] * K1 * m1[None, :])[:Z, :Z], dtype)
    Mz = jnp.asarray((m1[:, None] * M1 * m1[None, :])[:Z, :Z], dtype)
    Kxl, Mxl = local_1d(bx)
    Kyl, Myl = local_1d(by)
    Kxb = jnp.asarray(to_bands(Kxl, p).reshape(nb, X, 1, 1), dtype)
    Mxb = jnp.asarray(to_bands(Mxl, p).reshape(nb, X, 1, 1), dtype)
    Kyb = jnp.asarray(to_bands(Kyl, p).reshape(nb, 1, Y, 1), dtype)
    Myb = jnp.asarray(to_bands(Myl, p).reshape(nb, 1, Y, 1), dtype)

    def kernel(u_hbm, Kz_r, Mz_r, Kx_r, Mx_r, Ky_r, My_r, out_hbm,
               slab, outs, carry_y, carry_x, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        cin = pltpu.make_async_copy(
            u_hbm.at[pl.ds(i * bx * p, X), pl.ds(j * byp, byp), pl.ds(0, Z)],
            slab.at[:, 0:byp, :], sems.at[0],
        )
        cin.start()

        @pl.when(j < nbj - 1)
        def _():
            cin2 = pltpu.make_async_copy(
                u_hbm.at[pl.ds(i * bx * p, X), pl.ds((j + 1) * byp, 8),
                         pl.ds(0, Z)],
                slab.at[:, byp:byp + 8, :], sems.at[2],
            )
            cin2.start()
            cin2.wait()

        @pl.when(j == nbj - 1)
        def _():
            slab[:, byp:byp + 8, :] = jnp.zeros((X, 8, Z), dtype)

        cin.wait()

        xi = jax.lax.broadcasted_iota(jnp.int32, (X, 1, 1), 0)
        yi = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)
        mvx = jnp.logical_and(
            jnp.logical_or(i > 0, xi > 0),
            jnp.logical_or(i < nbi - 1, xi < X - 1),
        ).astype(dtype)
        mvy = jnp.logical_and(
            jnp.logical_or(j > 0, yi > 0),
            jnp.logical_or(j < nbj - 1, yi < Y - 1),
        ).astype(dtype)
        um = slab[:, :Y, :] * mvx * mvy

        def banded(t, bands_ref, axis):
            L = t.shape[axis]
            acc = bands_ref[p] * t
            for o in range(1, p + 1):
                acc += bands_ref[p + o] * pltpu.roll(t, L - o, axis=axis)
                acc += bands_ref[p - o] * pltpu.roll(t, o, axis=axis)
            return acc

        flat = um.reshape(X * Y, Z)
        bz = jnp.dot(flat, Mz_r[:, :], precision=zprec,
                     preferred_element_type=dtype).reshape(X, Y, Z)
        az = jnp.dot(flat, Kz_r[:, :], precision=zprec,
                     preferred_element_type=dtype).reshape(X, Y, Z)
        mb = banded(bz, My_r, 1)
        kb = banded(bz, Ky_r, 1)
        ma = banded(az, My_r, 1)
        raw = banded(mb, Kx_r, 0) + banded(kb + ma, Mx_r, 0)

        wbuf = jax.lax.rem(i, jnp.int32(2))
        rbuf = 1 - wbuf
        carry_x[wbuf, j] = raw[X - 1]
        tmp_cy = raw[:, Y - 1, :]
        cy = jnp.where(j > 0, carry_y[:, :], jnp.zeros_like(carry_y))
        carry_y[:, :] = tmp_cy
        seg = carry_x[rbuf, j]
        prev_last = carry_x[rbuf, jnp.maximum(j - 1, 0)][Y - 1:Y, :]
        cx = seg[:Y - 1, :]
        cx_row0 = cx[:1, :] + jnp.where(j > 0, prev_last,
                                        jnp.zeros_like(prev_last))
        cx = jnp.concatenate([cx_row0, cx[1:, :]], axis=0)
        cx = jnp.where(i > 0, cx, jnp.zeros_like(cx))
        outv = raw[:X - 1, :Y - 1, :]
        plane_y0 = outv[:, :1, :] + cy[:X - 1][:, None, :]
        outv = jnp.concatenate([plane_y0, outv[:, 1:, :]], axis=1)
        plane_x0 = outv[:1, :, :] + cx[None, :, :]
        outv = jnp.concatenate([plane_x0, outv[1:, :, :]], axis=0)
        outv = outv * mvx[:X - 1] * mvy[:, :Y - 1]
        outs[:, :, :] = outv
        cout = pltpu.make_async_copy(
            outs,
            out_hbm.at[pl.ds(i * bx * p, X - 1), pl.ds(j * byp, Y - 1),
                       pl.ds(0, Z)],
            sems.at[1],
        )
        cout.start()
        cout.wait()

    inner = pl.pallas_call(
        kernel,
        grid=(nbi, nbj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((N, N, N), dtype),
        scratch_shapes=[
            pltpu.VMEM((X, byp + 8, Z), dtype),
            pltpu.VMEM((X - 1, Y - 1, Z), dtype),
            pltpu.VMEM((X, Z), dtype),
            pltpu.VMEM((2, nbj, Y, Z), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )

    maskg = jnp.asarray(space.free_mask(), dtype)

    @jax.jit
    def apply(u):
        au = inner(u, Kz, Mz, Kxb, Mxb, Kyb, Myb)
        au = (au.at[-1, :, :].set(0.0).at[:, -1, :].set(0.0)
              .at[:, :, -1].set(0.0))
        return maskg * au + (1.0 - maskg) * u

    return apply


def measure(f, x0, ns=(2, 10)):
    ts = {}
    for n in ns:
        @jax.jit
        def loop(v, n=n):
            y = jax.lax.fori_loop(0, n, lambda k, w: f(w), v)
            return jnp.sum(y.ravel()[:1])
        float(loop(x0))
        t0 = time.perf_counter()
        float(loop(x0))
        ts[n] = time.perf_counter() - t0
    return (ts[ns[1]] - ts[ns[0]]) / (ns[1] - ns[0])


def main():
    sp = FESpace(HyperCubeMesh(3, 6), 4)
    u = jnp.asarray(
        np.random.default_rng(0).standard_normal(sp.grid_shape), jnp.float32
    )
    want = None
    results = {}

    op8 = make_pallas_laplace(sp, jnp.float32, bx=8, by=8)
    f8 = jax.jit(op8.apply)
    want = np.asarray(f8(u))

    for prec in ("highest", "default"):
        fz = build_zmxu(sp, jnp.float32, bx=8, by=8, zprec=prec)
        got = np.asarray(fz(u))
        err = np.abs(got - want).max() / np.abs(want).max()
        results[f"zmxu-{prec}"] = measure(fz, u)
        print(f"zmxu-{prec} 8x8: {results[f'zmxu-{prec}']*1e3:.3f} ms "
              f"(err {err:.1e})", flush=True)

    best = min(results, key=results.get)
    print(f"best: {best} @ {results[best]*1e3:.3f} ms "
          f"({sp.n_dofs/results[best]/1e9:.2f} GDoF/s)")


if __name__ == "__main__":
    main()
