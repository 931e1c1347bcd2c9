"""Standalone experiment: fused Pallas vmult kernel (3D, banded Kronecker).

One HBM read + one HBM write per apply.  The assembled 1D matrices are
(2p+1)-banded, so every 1D contraction is a sum of 2p+1 rolled
broadcast-FMAs on the VPU — no matmuls, no transposes, exact f32.  Carry
planes resolve the overlap-add across the sequential grid; Dirichlet masks
fold into the band coefficients (z on the host, x/y in-kernel via iota
masks at domain-edge blocks).

Run on TPU:  python experiments/pallas_vmult.py [--check] [--bench]
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
from portable_multigrid_tpu.ops.laplace import assembled_1d_matrices, make_laplace


def to_bands(W: np.ndarray, p: int) -> np.ndarray:
    """[L, L] banded matrix -> bands [2p+1, L]: bands[p+o, i] = W[i, i+o]
    (zero where i+o is out of range, which also kills roll wrap-around)."""
    L = W.shape[0]
    bands = np.zeros((2 * p + 1, L))
    for o in range(-p, p + 1):
        for i in range(max(0, -o), min(L, L - o)):
            bands[p + o, i] = W[i, i + o]
    return bands


def build(space, dtype=jnp.float32, bx=8, by=8, interpret=False):
    p = space.degree
    n = space.mesh.cells_per_axis
    N = space.points_per_axis
    assert n % bx == 0 and n % by == 0
    X = bx * p + 1
    Y = by * p + 1
    # Lane trick: HBM DMA lane slices must be 128-aligned; the global last
    # z-plane is Dirichlet-constrained (reads as zero, written outside), so
    # the kernel works on exactly Z = n*p lanes, which must be a multiple
    # of 128.
    Z = n * p
    if Z % 128 != 0 and not interpret:
        raise ValueError(
            f"pallas variant needs n*p % 128 == 0 (got {Z}); use the kron "
            "variant for this size"
        )
    nbi, nbj = n // bx, n // by
    nb = 2 * p + 1

    K1, M1 = assembled_1d_matrices(space)
    m1 = space.free_mask_1d()

    def local_1d(b):
        """PARTIAL 1D assembly over exactly b cells: boundary rows/cols carry
        only the block's own cell contributions (completed by the carries).
        Slicing the global assembly would double-count the shared-plane
        diagonal blocks."""
        from portable_multigrid_tpu.fem.basis import make_basis

        bas = make_basis(p)
        W = np.diag(bas.q_weights)
        Kc = (bas.D.T @ W @ bas.D) / space.mesh.h
        Mc = (bas.B.T @ W @ bas.B) * space.mesh.h
        w = b * p + 1
        K = np.zeros((w, w))
        M = np.zeros((w, w))
        for c in range(b):
            sl = slice(c * p, c * p + p + 1)
            K[sl, sl] += Kc
            M[sl, sl] += Mc
        return K, M

    # z: the full (unblocked) axis uses the global assembly with the mask
    # folded on the host (restriction to [:Z] is exact because the masked
    # matrices have zero row/col at the last plane); x/y: partial block-local
    # assemblies, masked in-kernel
    Kzm = (m1[:, None] * K1 * m1[None, :])[:Z, :Z]
    Mzm = (m1[:, None] * M1 * m1[None, :])[:Z, :Z]
    Kzb = to_bands(Kzm, p).reshape(nb, 1, 1, Z)
    Mzb = to_bands(Mzm, p).reshape(nb, 1, 1, Z)
    Kxl, Mxl = local_1d(bx)
    Kyl, Myl = local_1d(by)
    Kxb = to_bands(Kxl, p).reshape(nb, X, 1, 1)
    Mxb = to_bands(Mxl, p).reshape(nb, X, 1, 1)
    Kyb = to_bands(Kyl, p).reshape(nb, 1, Y, 1)
    Myb = to_bands(Myl, p).reshape(nb, 1, Y, 1)

    band_args = [jnp.asarray(v, dtype) for v in (Kzb, Mzb, Kxb, Mxb, Kyb, Myb)]

    byp = by * p
    if byp % 8 != 0 and not interpret:
        raise ValueError("pallas variant needs by*p % 8 == 0")

    def kernel(u_hbm, Kz_r, Mz_r, Kx_r, Mx_r, Ky_r, My_r, out_hbm,
               slab, outs, carry_y, carry_x, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)

        # HBM sublane slices must be 8-aligned: fetch the y-window as the
        # aligned [byp] body plus the next 8 rows (absent at the last block,
        # where the extra row is the Dirichlet boundary -> zeros).
        cin = pltpu.make_async_copy(
            u_hbm.at[pl.ds(i * bx * p, X), pl.ds(j * byp, byp), pl.ds(0, Z)],
            slab.at[:, 0:byp, :], sems.at[0],
        )
        cin.start()

        @pl.when(j < nbj - 1)
        def _():
            cin2 = pltpu.make_async_copy(
                u_hbm.at[
                    pl.ds(i * bx * p, X), pl.ds((j + 1) * byp, 8), pl.ds(0, Z)
                ],
                slab.at[:, byp : byp + 8, :], sems.at[2],
            )
            cin2.start()
            cin2.wait()

        @pl.when(j == nbj - 1)
        def _():
            slab[:, byp : byp + 8, :] = jnp.zeros((X, 8, Z), dtype)

        cin.wait()

        # in-kernel Dirichlet edge masks for the blocked axes
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

        um = slab[:, :Y, :] * mvx * mvy  # z-mask folded into z-bands

        def banded(t, bands_ref, axis):
            L = t.shape[axis]
            acc = bands_ref[p] * t
            for o in range(1, p + 1):
                # roll shift must be non-negative: -o == L - o (circular)
                acc += bands_ref[p + o] * pltpu.roll(t, L - o, axis=axis)
                acc += bands_ref[p - o] * pltpu.roll(t, o, axis=axis)
            return acc

        b = banded(um, Mz_r, 2)  # M_z u
        a = banded(um, Kz_r, 2)  # K_z u
        mb = banded(b, My_r, 1)
        kb = banded(b, Ky_r, 1)
        ma = banded(a, My_r, 1)
        raw = banded(mb, Kx_r, 0) + banded(kb + ma, Mx_r, 0)

        # ---- carries (raw contributions only; static-size slots) ----
        wbuf = jax.lax.rem(i, 2)
        rbuf = 1 - wbuf
        carry_x[wbuf, j] = raw[X - 1]
        tmp_cy = raw[:, Y - 1, :]

        cy = jnp.where(j > 0, carry_y[:, :], jnp.zeros_like(carry_y))
        carry_y[:, :] = tmp_cy

        seg = carry_x[rbuf, j]  # [Y, Z]
        prev_last = carry_x[rbuf, jnp.maximum(j - 1, 0)][Y - 1 : Y, :]
        cx = seg[: Y - 1, :]
        cx_row0 = cx[:1, :] + jnp.where(
            j > 0, prev_last, jnp.zeros_like(prev_last)
        )
        cx = jnp.concatenate([cx_row0, cx[1:, :]], axis=0)
        cx = jnp.where(i > 0, cx, jnp.zeros_like(cx))

        outv = raw[: X - 1, : Y - 1, :]
        plane_y0 = outv[:, :1, :] + cy[: X - 1][:, None, :]
        outv = jnp.concatenate([plane_y0, outv[:, 1:, :]], axis=1)
        plane_x0 = outv[:1, :, :] + cx[None, :, :]
        outv = jnp.concatenate([plane_x0, outv[1:, :, :]], axis=0)
        # output mask on the written planes
        outv = outv * mvx[: X - 1] * mvy[:, : Y - 1]

        outs[:, :, :] = outv
        cout = pltpu.make_async_copy(
            outs,
            out_hbm.at[
                pl.ds(i * bx * p, X - 1), pl.ds(j * by * p, Y - 1), pl.ds(0, Z)
            ],
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
            pltpu.VMEM((X, byp + 8, Z), dtype),
            pltpu.VMEM((X - 1, Y - 1, Z), dtype),
            pltpu.VMEM((X, Z), dtype),
            pltpu.VMEM((2, nbj, Y, Z), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    maskg = jnp.asarray(space.free_mask(), dtype)

    @jax.jit
    def apply(u):
        au = inner(u, *band_args)
        # unwritten global last planes (x, y, and the z lane-trick plane):
        # all Dirichlet faces -> out = u there via the mask combine
        au = (
            au.at[-1, :, :].set(0.0)
            .at[:, -1, :].set(0.0)
            .at[:, :, -1].set(0.0)
        )
        return maskg * au + (1.0 - maskg) * u

    return apply


def main():
    check = "--check" in sys.argv
    bench = "--bench" in sys.argv
    if check:
        sp = FESpace(HyperCubeMesh(3, 5), 4)  # 32^3 cells, N=129, Z=128
        op = make_laplace(sp, jnp.float32, variant="kron")
        u = jnp.asarray(
            np.random.default_rng(0).standard_normal(sp.grid_shape), jnp.float32
        )
        want = np.asarray(jax.jit(op.apply)(u))
        for bx in (4, 8):
            f = build(sp, jnp.float32, bx=bx, by=bx)
            got = np.asarray(f(u))
            err = np.abs(got - want).max() / np.abs(want).max()
            print(f"bx={bx} rel err: {err}", flush=True)
            assert err < 1e-5, err
        print("CHECK OK", flush=True)
    if bench:
        sp = FESpace(HyperCubeMesh(3, 6), 4)
        for bx in (4, 8):
            f = build(sp, jnp.float32, bx=bx, by=bx)
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
                f"bx={bx}: {dt*1e3:.3f} ms ({sp.n_dofs/dt/1e9:.2f} GDoF/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
