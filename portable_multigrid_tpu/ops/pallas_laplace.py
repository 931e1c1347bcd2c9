"""Fused Pallas TPU vmult kernel: one HBM read + one HBM write per apply.

The production hot kernel (SURVEY.md §7 M3) for Cartesian uniform meshes in
3D.  Reformulates the reference's per-cell sum factorization (reference:
include/operators/portable_laplace_operator.h:212-381) as the banded
Kronecker form of the ASSEMBLED operator:

    A = Kx (x) My (x) Mz + Mx (x) Ky (x) Mz + Mx (x) My (x) Kz

with (2p+1)-banded 1D matrices, so every 1D contraction is a sum of 2p+1
rolled broadcast-FMAs on the VPU — exact f32, no matmuls, no transposes, no
layout shuffles.  The grid is blocked over x/y cell slabs (z full in lanes);
each block applies the PARTIAL block-local operator in VMEM, and the
inter-block overlap-add is resolved by sequential-grid carry planes (a
double-buffered x-plane slot per y-block plus a y-plane carry) — the in-VMEM
analog of the reference's atomics/coloring for scatter conflicts (SURVEY.md
§2.3 item 3).

Alignment tricks (Mosaic DMA constraints: lane slices 128-aligned, sublane
slices 8-aligned):
  * the kernel operates on Z = n*p lanes — the global last z-plane is
    Dirichlet-constrained, reads as zero through the mask folded into the
    z-bands, and is written outside via the mask combine;
  * the y-window (by*p + 1 rows) is fetched as the aligned by*p-row body
    plus the next 8 rows (zeros at the last block).

Eligibility: dim == 3, Cartesian uniform mesh, n*p % 128 == 0,
bx*p and by*p % 8 == 0.  Use make_laplace_auto to fall back to "kron"
elsewhere.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem.basis import make_basis
from ..fem.space import FESpace
from ..utils.pytree import pytree_dataclass, static_field
from .laplace import _diagonal_grid, assembled_1d_matrices, make_laplace


def to_bands(W: np.ndarray, p: int) -> np.ndarray:
    """[L, L] banded matrix -> bands [2p+1, L]: bands[p+o, i] = W[i, i+o]
    (zero where i+o is out of range, which also kills roll wrap-around)."""
    L = W.shape[0]
    bands = np.zeros((2 * p + 1, L))
    for o in range(-p, p + 1):
        for i in range(max(0, -o), min(L, L - o)):
            bands[p + o, i] = W[i, i + o]
    return bands


def pallas_eligible(space: FESpace, bx: int = 8, by: int = 8) -> bool:
    n, p = space.mesh.cells_per_axis, space.degree
    return (
        space.dim == 3
        and (n * p) % 128 == 0
        and n % bx == 0
        and n % by == 0
        and (bx * p) % 8 == 0
        and (by * p) % 8 == 0
    )


@pytree_dataclass
class PallasLaplaceOperator:
    """Pytree wrapper: the kernel is rebuilt at trace time from band arrays."""

    dim: int = static_field()
    degree: int = static_field()
    n: tuple = static_field()
    bx: int = static_field()
    by: int = static_field()
    interpret: bool = static_field(default=False)
    bands: tuple = None  # (Kzb, Mzb, Kxb, Mxb, Kyb, Myb)
    mask: jnp.ndarray = None
    inv_diag: jnp.ndarray = None

    @property
    def grid_shape(self):
        return tuple(nd * self.degree + 1 for nd in self.n)

    @property
    def n_dofs(self):
        out = 1
        for s in self.grid_shape:
            out *= s
        return out

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        p = self.degree
        n = self.n[0]
        N = n * p + 1
        bx, by = self.bx, self.by
        X, Y, Z = bx * p + 1, by * p + 1, n * p
        nbi, nbj = n // bx, n // by
        byp = by * p
        dtype = self.mask.dtype
        nb = 2 * p + 1

        if byp % 8 != 0:
            raise ValueError("pallas kernel requires by*p % 8 == 0")

        def kernel(u_hbm, Kz_r, Mz_r, Kx_r, Mx_r, Ky_r, My_r, out_hbm,
                   slab, outs, carry_y, carry_x, sems):
            i = pl.program_id(0)
            j = pl.program_id(1)

            cin = pltpu.make_async_copy(
                u_hbm.at[pl.ds(i * bx * p, X), pl.ds(j * byp, byp),
                         pl.ds(0, Z)],
                slab.at[:, 0:byp, :], sems.at[0],
            )
            cin.start()

            @pl.when(j < nbj - 1)
            def _():
                cin2 = pltpu.make_async_copy(
                    u_hbm.at[pl.ds(i * bx * p, X),
                             pl.ds((j + 1) * byp, 8), pl.ds(0, Z)],
                    slab.at[:, byp: byp + 8, :], sems.at[3],
                )
                cin2.start()
                cin2.wait()

            @pl.when(j == nbj - 1)
            def _():
                slab[:, byp: byp + 8, :] = jnp.zeros((X, 8, Z), dtype)

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

            def banded_pair(t, bandsA, bandsB, axis):
                """Two banded contractions of the SAME input share one set of
                rolls (the shifted copies dominate kernel time)."""
                L = t.shape[axis]
                accA = bandsA[p] * t
                accB = bandsB[p] * t
                for o in range(1, p + 1):
                    tl = pltpu.roll(t, L - o, axis=axis)
                    tr = pltpu.roll(t, o, axis=axis)
                    accA += bandsA[p + o] * tl + bandsA[p - o] * tr
                    accB += bandsB[p + o] * tl + bandsB[p - o] * tr
                return accA, accB

            b, a = banded_pair(um, Mz_r, Kz_r, 2)
            mb, kb = banded_pair(b, My_r, Ky_r, 1)
            ma = banded(a, My_r, 1)
            raw = banded(mb, Kx_r, 0) + banded(kb + ma, Mx_r, 0)

            wbuf = jax.lax.rem(i, jnp.int32(2))
            rbuf = 1 - wbuf
            carry_x[wbuf, j] = raw[X - 1]
            tmp_cy = raw[:, Y - 1, :]

            cy = jnp.where(j > 0, carry_y[:, :], jnp.zeros_like(carry_y))
            carry_y[:, :] = tmp_cy

            seg = carry_x[rbuf, j]
            prev_last = carry_x[rbuf, jnp.maximum(j - 1, 0)][Y - 1: Y, :]
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
            outv = outv * mvx[: X - 1] * mvy[:, : Y - 1]

            # double-buffered output write-back: start this block's DMA and
            # only wait for it one grid step later (before its slot is
            # reused), so compute overlaps the write.
            k = i * nbj + j
            oslot = jax.lax.rem(k, jnp.int32(2))

            def out_dma(slot, ii, jj):
                return pltpu.make_async_copy(
                    outs.at[slot],
                    out_hbm.at[pl.ds(ii * bx * p, X - 1),
                               pl.ds(jj * byp, Y - 1), pl.ds(0, Z)],
                    sems.at[1 + slot],
                )

            @pl.when(k >= 2)
            def _():
                k2 = k - 2
                out_dma(oslot, k2 // nbj, jax.lax.rem(k2, jnp.int32(nbj))).wait()

            outs[oslot] = outv
            cout = out_dma(oslot, i, j)
            cout.start()

            # drain both in-flight writes at the final grid step
            @pl.when(k == nbi * nbj - 1)
            def _():
                cout.wait()

                @pl.when(k >= 1)
                def _():
                    k1 = k - 1
                    out_dma(
                        1 - oslot, k1 // nbj, jax.lax.rem(k1, jnp.int32(nbj))
                    ).wait()

        inner = pl.pallas_call(
            kernel,
            grid=(nbi, nbj),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            # trimmed, fully-written output (the global last planes are
            # Dirichlet faces, re-added by a fused zero-pad below) — avoids
            # both uninitialized-memory hazards and three update-slice passes
            out_shape=jax.ShapeDtypeStruct((N - 1, N - 1, Z), dtype),
            scratch_shapes=[
                pltpu.VMEM((X, byp + 8, Z), dtype),
                pltpu.VMEM((2, X - 1, Y - 1, Z), dtype),
                pltpu.VMEM((X, Z), dtype),
                pltpu.VMEM((2, nbj, Y, Z), dtype),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )

        u = u.reshape(self.grid_shape)
        au = inner(u, *self.bands)
        # global last planes are Dirichlet faces (mask == 0 there): zero-pad
        # back to the full grid; XLA fuses pad + mask combine into one pass
        au = jnp.pad(au, ((0, 1), (0, 1), (0, 1)))
        return self.mask * au + (1.0 - self.mask) * u

    vmult = apply


def make_pallas_laplace(
    space: FESpace,
    dtype=jnp.float32,
    bx: int = 8,
    by: int = 8,
    interpret: bool = False,
) -> PallasLaplaceOperator:
    if not (interpret or pallas_eligible(space, bx, by)):
        raise ValueError(
            "pallas operator requires dim==3, n*p % 128 == 0 and "
            "8-aligned block windows; use make_laplace_auto for fallback"
        )
    p = space.degree
    n = space.mesh.cells_per_axis
    X, Y, Z = bx * p + 1, by * p + 1, n * p
    nb = 2 * p + 1
    K1, M1 = assembled_1d_matrices(space)
    m1 = space.free_mask_1d()

    b = make_basis(p)
    W = np.diag(b.q_weights)
    Kc = (b.D.T @ W @ b.D) / space.mesh.h
    Mc = (b.B.T @ W @ b.B) * space.mesh.h

    def local_1d(blk):
        # PARTIAL assembly over exactly blk cells (boundary rows carry only
        # the block's own contributions, completed by the carries)
        w = blk * p + 1
        K = np.zeros((w, w))
        M = np.zeros((w, w))
        for c in range(blk):
            sl = slice(c * p, c * p + p + 1)
            K[sl, sl] += Kc
            M[sl, sl] += Mc
        return K, M

    Kzm = (m1[:, None] * K1 * m1[None, :])[:Z, :Z]
    Mzm = (m1[:, None] * M1 * m1[None, :])[:Z, :Z]
    Kxl, Mxl = local_1d(bx)
    Kyl, Myl = local_1d(by)
    bands = (
        to_bands(Kzm, p).reshape(nb, 1, 1, Z),
        to_bands(Mzm, p).reshape(nb, 1, 1, Z),
        to_bands(Kxl, p).reshape(nb, X, 1, 1),
        to_bands(Mxl, p).reshape(nb, X, 1, 1),
        to_bands(Kyl, p).reshape(nb, 1, Y, 1),
        to_bands(Myl, p).reshape(nb, 1, Y, 1),
    )
    diag = _diagonal_grid(space)
    return PallasLaplaceOperator(
        dim=space.dim,
        degree=p,
        n=(n,) * space.dim,
        bx=bx,
        by=by,
        interpret=interpret,
        bands=tuple(jnp.asarray(v, dtype) for v in bands),
        mask=jnp.asarray(space.free_mask(), dtype),
        inv_diag=jnp.asarray(1.0 / diag, dtype),
    )


def make_laplace_auto(space: FESpace, dtype=jnp.float32, precision="high"):
    """Fastest eligible operator: fused Pallas kernel where it applies,
    assembled-Kronecker XLA path otherwise.

    Block-size choice: 8x8 cells measured fastest inside full V-cycles
    (16x16 wins isolated apply micro-benchmarks via DMA pipelining across
    chained calls, but loses in composed programs where the few large grid
    steps pipeline poorly); 16x16 is used only on very large grids."""
    if dtype == jnp.float32:
        blocks = (16, 8) if space.mesh.cells_per_axis >= 128 else (8,)
        for b in blocks:
            if pallas_eligible(space, b, b) and (b * space.degree + 1) ** 2 * (
                space.mesh.cells_per_axis * space.degree
            ) * 4 * 8 < 100 * 1024 * 1024:
                return make_pallas_laplace(space, dtype, bx=b, by=b)
    return make_laplace(space, dtype, variant="kron", precision=precision)
