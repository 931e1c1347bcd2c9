"""2D device-mesh sharding: pencil decomposition over ('x', 'y').

Scales the domain decomposition beyond 1D slabs: cells are partitioned in
both grid axes over a 2D jax.sharding.Mesh, with single-plane halos on each
sharded axis.  The corner (4-way duplicated) points are handled by ORDERING
the halo exchanges — the y-exchange sends x-completed planes, so diagonal
neighbors' contributions arrive transitively (the same argument as the
Pallas kernel's carry scheme).  This mirrors how a v5e/v5p pod's 2D ICI
torus is best utilized.

Only the pieces that differ from the 1D machinery live here; everything
else (operators, smoothers, V-cycle, CG) is reused unchanged.
"""

from __future__ import annotations

import dataclasses
import math
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..fem.assemble import assemble_rhs, l2_norm
from ..fem.mesh import HyperCubeMesh
from ..fem.space import FESpace
from ..ops.laplace import LaplaceOperator, diagonal_1d_factors, make_laplace
from ..ops.transfer import Transfer, _weights_1d, make_h_transfer
from ..fem.basis import h_prolongation_matrix_1d
from ..solvers.cg import cg
from ..solvers.chebyshev import Chebyshev, chebyshev_bounds, \
    estimate_eigenvalues, _pseudo_random_grid
from ..solvers.vcycle import MGLevel, VCycle
from ..utils.pytree import pytree_dataclass, static_field
from .poisson import _partial_assembled_1d, _unstack
from .sharding import halo_sum, slab_bounds

AX, AY = "x", "y"


def partition_2d(arr, n: int, p: int, sx: int, sy: int):
    """[N, N, ...] grid -> [sx, sy, N_locx, N_locy, ...] pencil blocks
    (duplicated boundary planes on both sharded axes)."""
    arr = np.asarray(arr)
    bx = slab_bounds(n, p, sx)
    by = slab_bounds(n, p, sy)
    rows = [
        [arr[b0:b1, c0:c1] for (c0, c1) in by] for (b0, b1) in bx
    ]
    return np.stack([np.stack(r) for r in rows])


def unpartition_2d(st, n: int, p: int, sx: int, sy: int):
    st = np.asarray(st)
    cols = []
    for i in range(sx):
        row = [st[i, j][:, :-1] for j in range(sy - 1)] + [st[i, sy - 1]]
        row = np.concatenate(row, axis=1)
        cols.append(row[:-1] if i < sx - 1 else row)
    return np.concatenate(cols, axis=0)


def halo_sum_2d(t: jnp.ndarray, sx: int, sy: int) -> jnp.ndarray:
    """x-exchange first, then y (which transmits the x-completed planes,
    covering the 4-way corner duplication transitively)."""
    t = halo_sum(t, AX, sx, axis=0)
    return halo_sum(t, AY, sy, axis=1)


@pytree_dataclass
class Sharded2DLaplace:
    sx: int = static_field()
    sy: int = static_field()
    local: LaplaceOperator = None

    @property
    def inv_diag(self):
        return self.local.inv_diag

    @property
    def mask(self):
        return self.local.mask

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        loc = self.local
        u = u.reshape(loc.grid_shape)
        au = loc.apply_bilinear(u * loc.mask)
        au = halo_sum_2d(au, self.sx, self.sy)
        return loc.mask * au + (1.0 - loc.mask) * u

    vmult = apply


@pytree_dataclass
class Sharded2DTransfer:
    sx: int = static_field()
    sy: int = static_field()
    local: Transfer = None

    def prolongate(self, c):
        return halo_sum_2d(self.local.prolongate(c), self.sx, self.sy)

    def prolongate_and_add(self, dst, c):
        return dst + self.prolongate(c)

    def restrict(self, f):
        return halo_sum_2d(self.local.restrict(f), self.sx, self.sy)

    def restrict_and_add(self, dst, f):
        return dst + self.restrict(f)


def _tile2(arr, sx, sy, dtype):
    a = jnp.asarray(np.asarray(arr), dtype)
    return jnp.broadcast_to(a[None, None], (sx, sy) + a.shape)


def _tile_tree2(tree, sx, sy):
    """Broadcast every leaf of a pytree with two leading mesh axes."""
    return jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None, None], (sx, sy) + a.shape), tree
    )


@pytree_dataclass
class ShardedPallas2DLaplace:
    """Fused Pallas kernel on a PENCIL-sharded grid (2D device mesh): the
    slab kernel runs with per-shard x AND y mask vectors (interior pencil
    boundaries unmasked), emits raw partial planes on both sharded axes,
    and the dropped last x/y planes are recomputed by thin XLA contractions
    of the local partial operator (the 2D analog of
    sharding.ShardedPallasLaplace's completion) before ONE ordered 2D halo
    exchange — the same single hot kernel for serial, 1D and 2D distributed
    runs (reference: include/operators/portable_laplace_operator.h:557-719).
    """

    sx: int = static_field()
    sy: int = static_field()
    local: object = None  # PallasLaplaceOperator pencil slab (vector masks)
    thin_kx: jnp.ndarray = None  # [p+1] last row of the slab-partial K (x)
    thin_mx: jnp.ndarray = None
    thin_ky: jnp.ndarray = None
    thin_my: jnp.ndarray = None
    Kxm: jnp.ndarray = None  # [N0loc, N0loc] slab-partial x (mask-folded)
    Mxm: jnp.ndarray = None
    Kym: jnp.ndarray = None  # [N1loc, N1loc] slab-partial y (mask-folded)
    Mym: jnp.ndarray = None
    Kzm: jnp.ndarray = None  # [Z, Z] global masked z
    Mzm: jnp.ndarray = None

    @property
    def inv_diag(self):
        return self.local.inv_diag

    @property
    def mask(self):
        return self.local.mask

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        loc = self.local
        p = loc.degree
        u = u.reshape(loc.grid_shape)
        N0, N1 = loc.grid_shape[0], loc.grid_shape[1]
        Z = loc.n[2] * p
        # vector-y kernels always fetch the 8-row y tail (the duplicated
        # plane is interior data): pad the input so the aligned read of the
        # last block stays in bounds; lane-padded kernels additionally
        # extend z to the inert Z + zpad lanes (single-chip mechanism)
        pz = (0, loc.zpad - 1) if loc.zpad else (0, 0)
        raw = loc._run("apply", jnp.pad(u, ((0, 0), (0, 7), pz)))
        if loc.zpad:
            raw = raw[:, :, :Z]

        um = (u * loc.mask1[0].reshape(-1, 1, 1)
              * loc.mask1[1].reshape(1, -1, 1)
              * loc.mask1[2].reshape(1, 1, -1))
        hi = jax.lax.Precision.HIGHEST

        def ctr(t, W, ax):
            return jnp.moveaxis(
                jnp.tensordot(t, W, axes=((ax,), (1,)), precision=hi), -1, ax
            )

        def thin(win, tk, tm, Ko, Mo, oax):
            """Contributions of OUR cells to the dropped plane along axis 0
            of ``win`` (a (p+1)-window), with the OTHER in-plane axis
            contracted by the slab-partial (Ko, Mo)."""
            b = ctr(win, self.Mzm, 2)
            a = ctr(win, self.Kzm, 2)
            mb = ctr(b, Mo, oax)
            kb = ctr(b, Ko, oax)
            ma = ctr(a, Mo, oax)
            out = jnp.tensordot(tk, mb, axes=(0, 0), precision=hi)
            return out + jnp.tensordot(tm, kb + ma, axes=(0, 0), precision=hi)

        # last x-plane (full local y extent, includes the corner line)
        plane_x = thin(um[-(p + 1):], self.thin_kx, self.thin_mx,
                       self.Kym, self.Mym, 1)  # [N1, Z']
        # last y-plane (x extent w/o the last row — the corner lives above)
        wy = jnp.moveaxis(um[:, -(p + 1):], 1, 0)  # [p+1, N0, Z]
        plane_y = thin(wy, self.thin_ky, self.thin_my,
                       self.Kxm, self.Mxm, 1)  # [N0, Z']

        au = jnp.concatenate([raw, plane_y[: N0 - 1, None, :Z]], axis=1)
        au = jnp.concatenate([au, plane_x[None, :N1, :Z]], axis=0)
        au = jnp.pad(au, ((0, 0), (0, 0), (0, 1)))
        au = halo_sum_2d(au, self.sx, self.sy)
        m = loc.mask
        return m * au + (1.0 - m) * u

    vmult = apply


def _build_stacked_pallas2d(
    space: FESpace, sx: int, sy: int, dtype, core: str = "banded",
    interpret: bool = False, zpad: int | None = None,
):
    """Stacked ShardedPallas2DLaplace for a level, or None if ineligible.

    ``zpad=None`` follows the lane_pad policy (lane-padded grids ride the
    same pencil kernels — z is not a sharded axis); an explicit value is
    for interpret-mode tests on tiny grids."""
    import dataclasses as _dc

    from ..ops.laplace import diagonal_1d_factors
    from ..ops.pallas_laplace import lane_pad, make_pallas_slab2d
    from .poisson import _partial_assembled_1d
    from .sharding import partition_axis0

    if dtype != jnp.float32:
        return None
    n, p = space.mesh.cells_per_axis, space.degree
    if n % sx or n % sy:
        return None
    nlx, nly = n // sx, n // sy
    zp = lane_pad(space) if zpad is None else zpad
    Zk = n * p + zp

    def pick(cells):
        for b in (16, 8, 4, 2, 1):
            if b == 16 and Zk > 256:
                continue
            if cells % b == 0 and (b * p) % 8 == 0:
                return b
        return None

    bx, by = pick(nlx), pick(nly)
    if bx is None or by is None:
        return None
    if not interpret and (Zk < 128 or Zk % 128 != 0):
        return None
    base = make_pallas_slab2d(
        space, nlx, nly, dtype, bx=bx, by=by, core=core, interpret=interpret,
        zpad=zp,
    )
    m1 = space.free_mask_1d()
    gK, gM = diagonal_1d_factors(space)

    def part(v, S):
        return partition_axis0(v, n, p, S)  # [S, N_loc]

    mx = part(m1, sx)
    my = part(m1, sy)

    def bcast_xy(vx, vy):
        """[sx,(..)] and [sy,(..)] -> stacked [sx, sy, ...] leaves."""
        ax = np.broadcast_to(vx[:, None], (sx, sy) + vx.shape[1:])
        ay = np.broadcast_to(vy[None], (sx, sy) + vy.shape[1:])
        return ax, ay

    stacked = _tile_tree2(base, sx, sy)
    mxa, mya = bcast_xy(mx, my)
    gKxa, gKya = bcast_xy(part(gK, sx), part(gK, sy))
    gMxa, gMya = bcast_xy(part(gM, sx), part(gM, sy))
    stacked = _dc.replace(
        stacked,
        mask1=(jnp.asarray(mxa, dtype), jnp.asarray(mya, dtype),
               stacked.mask1[2]),
        dK1=(jnp.asarray(gKxa, dtype), jnp.asarray(gKya, dtype),
             stacked.dK1[2]),
        dM1=(jnp.asarray(gMxa, dtype), jnp.asarray(gMya, dtype),
             stacked.dM1[2]),
    )
    Kpx, Mpx = _partial_assembled_1d(space, nlx)
    Kpy, Mpy = _partial_assembled_1d(space, nly)
    from ..ops.laplace import assembled_1d_matrices

    K1, M1 = assembled_1d_matrices(space)
    # FULL masked global z matrices (the thin windows span the whole z axis)
    K1m = m1[:, None] * K1 * m1[None, :]
    M1m = m1[:, None] * M1 * m1[None, :]

    def fold(mat, mvec):
        # [S, N_loc] mask slices folded into the per-shard partial matrix
        return mvec[:, :, None] * mat[None] * mvec[:, None, :]

    def stx(a):  # [sx, ...] -> [sx, sy, ...]
        return np.broadcast_to(a[:, None], (sx, sy) + a.shape[1:])

    def sty(a):  # [sy, ...] -> [sx, sy, ...]
        return np.broadcast_to(a[None], (sx, sy) + a.shape[1:])

    Kxm_x = stx(fold(Kpx, mx))
    Mxm_x = stx(fold(Mpx, mx))
    Kym_y = sty(fold(Kpy, my))
    Mym_y = sty(fold(Mpy, my))
    return ShardedPallas2DLaplace(
        sx=sx,
        sy=sy,
        local=stacked,
        thin_kx=_tile2(Kpx[-1, -(p + 1):], sx, sy, dtype),
        thin_mx=_tile2(Mpx[-1, -(p + 1):], sx, sy, dtype),
        thin_ky=_tile2(Kpy[-1, -(p + 1):], sx, sy, dtype),
        thin_my=_tile2(Mpy[-1, -(p + 1):], sx, sy, dtype),
        Kxm=jnp.asarray(Kxm_x, dtype),
        Mxm=jnp.asarray(Mxm_x, dtype),
        Kym=jnp.asarray(Kym_y, dtype),
        Mym=jnp.asarray(Mym_y, dtype),
        Kzm=_tile2(K1m, sx, sy, dtype),
        Mzm=_tile2(M1m, sx, sy, dtype),
    )


def _ext_axis(t: jnp.ndarray, h: int, axis: int, axis_name: str,
              S: int) -> jnp.ndarray:
    """Prepend/append ``h`` planes from the left/right neighbours along one
    sharded axis (zeros at the global ends — lax.ppermute yields zeros for
    unpaired shards).  The 2D-pencil generalisation of
    sharding.ShardedFusedChebyshev._ext_both."""
    if S == 1:
        z = jnp.zeros(t.shape[:axis] + (h,) + t.shape[axis + 1:], t.dtype)
        return jnp.concatenate([z, t, z], axis=axis)
    fwd = [(i, i + 1) for i in range(S - 1)]
    bwd = [(i + 1, i) for i in range(S - 1)]
    n_ax = t.shape[axis]
    left = jax.lax.ppermute(
        jax.lax.slice_in_dim(t, n_ax - h, n_ax, axis=axis), axis_name, fwd
    )
    right = jax.lax.ppermute(
        jax.lax.slice_in_dim(t, 0, h, axis=axis), axis_name, bwd
    )
    return jnp.concatenate([left, t, right], axis=axis)


def _build_stacked_cheb2_2d(
    space: FESpace, sx: int, sy: int, dtype, interpret: bool = False,
    bx: int | None = None, by: int | None = None, exact: bool = False,
    zpad: int | None = None,
):
    """Stacked xext+yext Cheb2Kernel for the 2D-pencil pair smoother, or
    None if ineligible.  The per-block x (y) matrix/factor stacks of the
    GLOBAL kernel partition naturally per x- (y-) shard; everything else
    broadcasts.  Inside shard_map the kernel is block-for-block the
    single-chip pair on the same windows (the 2D analog of
    parallel/poisson.py:_build_stacked_cheb2)."""
    import dataclasses as _dc

    from ..ops.pallas_cheb2 import _roundup8, cheb2_vmem_ok, make_cheb2
    from ..ops.pallas_laplace import lane_pad

    if dtype != jnp.float32:
        return None
    n, p = space.mesh.cells_per_axis, space.degree
    if n % sx or n % sy:
        return None
    nlx, nly = n // sx, n // sy
    zp = lane_pad(space) if zpad is None else zpad
    Zk = n * p + zp  # kernel lane extent (zpad lanes are inert zeros)
    if not interpret and (Zk < 128 or Zk % 128 != 0):
        return None
    Hd = _roundup8(2 * p)

    def pickb(cells, req):
        for b in (16, 8, 4, 2):
            if b == 16 and Zk > 256:
                continue
            if (cells % b == 0 and (b * p) % 8 == 0 and b * p >= req
                    and cheb2_vmem_ok(b, b, p, Zk)):
                return b
        return None

    bx = bx if bx is not None else pickb(nlx, 2 * p)
    by = by if by is not None else pickb(nly, Hd)
    if bx is None or by is None:
        return None
    if not (interpret or cheb2_vmem_ok(bx, by, p, Zk)):
        return None
    kern = make_cheb2(space, dtype, bx=bx, by=by, zpad=zp,
                      interpret=interpret, exact=exact)
    nbi_loc, nbj_loc = nlx // bx, nly // by
    if nbi_loc == 0 or nlx % bx or nbj_loc == 0 or nly % by:
        return None

    def part_x(a):  # [sx*nbi_loc, ...] -> [sx, sy, nbi_loc, ...]
        a = a.reshape((sx, nbi_loc) + a.shape[1:])
        return jnp.broadcast_to(a[:, None], (sx, sy) + a.shape[1:])

    def part_y(a):  # [sy*nbj_loc, ...] -> [sx, sy, nbj_loc, ...]
        a = a.reshape((sy, nbj_loc) + a.shape[1:])
        return jnp.broadcast_to(a[None], (sx, sy) + a.shape[1:])

    def tile(a):
        return jnp.broadcast_to(a[None, None], (sx, sy) + a.shape)

    x_mat_idx = {2, 3, 6, 7}  # S1Kx, S1Mx, S2Kx, S2Mx
    y_mat_idx = {4, 5, 8, 9}  # S1Ky, S1My, S2Ky, S2My
    x_fac_idx = {0, 1}  # f0xK, f0xM
    y_fac_idx = {2, 3}  # f0yK, f0yM
    return _dc.replace(
        kern,
        n=(nlx, nly, n),
        xext=True,
        yext=True,
        mats=tuple(
            part_x(m) if ix in x_mat_idx
            else part_y(m) if ix in y_mat_idx else tile(m)
            for ix, m in enumerate(kern.mats)
        ),
        facs=tuple(
            part_x(f) if ix in x_fac_idx
            else part_y(f) if ix in y_fac_idx else tile(f)
            for ix, f in enumerate(kern.facs)
        ),
    )


@pytree_dataclass
class ShardedFused2DChebyshev:
    """Halo-aware fused Chebyshev smoothing on pencil-sharded pallas levels.

    The 2D-pencil counterpart of sharding.ShardedFusedChebyshev, built
    entirely on the two-step pair kernel (ops/pallas_cheb2.py) in xext+yext
    mode: before each pair the d/r halos (2p/p planes in x, the 8-rounded
    Hd/Hr planes in y, per side) ship via ordered ppermute exchanges
    (y first, then x of the y-extended state, so corner halos arrive
    transitively) and every in-window output row is exact — no boundary
    corrections.  The entry residual half-step runs on the EXACT sharded
    banded operator (the production invariant: residuals stay f32-exact on
    the banded core).  ODD recurrence step counts run the tail step as a
    ZERO-COEFFICIENT pair (scal[2] = scal[3] = 0 makes step 2 the identity:
    d2 = 0, x2 = x1 — exact, at the cost of one wasted A·d apply on a
    single level), so any degree >= 2 rides the fused path.  Reference
    parity: one hot kernel serial and MPI
    (include/operators/portable_laplace_operator.h:557-719).

    Public surface is full-slab IO (smooth / apply), so the sharded
    V-cycle composition is unchanged.
    """

    sx: int = static_field()
    sy: int = static_field()
    degree: int = static_field()
    op: object = None  # exact ShardedPallas2DLaplace (residual entry)
    op_cheb2: object = None  # xext+yext Cheb2Kernel
    theta: jnp.ndarray = None
    delta: jnp.ndarray = None

    @property
    def _dims(self):
        """(grid_shape, Lx, Ly, Zr): Zr is the REAL trimmed lane extent;
        lane-padded kernels carry state with Zr + zpad inert zero lanes."""
        loc = self.op.local
        g = loc.grid_shape
        return g, g[0] - 1, g[1] - 1, loc.n[2] * loc.degree

    @property
    def _zp(self):
        return getattr(self.op.local, "zpad", 0)

    def _trim(self, t):
        g, Lx, Ly, Z = self._dims
        t = t.reshape(g)[:Lx, :Ly, :Z]
        if self._zp:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, self._zp)))
        return t

    def _diag_trimmed(self):
        loc = self.op.local
        _, Lx, Ly, Z = self._dims

        def zext(v):  # pad lanes hold 1.0 (state is zero there; 0/1 == 0)
            v = v[:Z]
            if self._zp:
                v = jnp.pad(v, (0, self._zp), constant_values=1.0)
            return v

        xK = loc.dK1[0][:Lx].reshape(-1, 1, 1)
        xM = loc.dM1[0][:Lx].reshape(-1, 1, 1)
        yK = loc.dK1[1][:Ly].reshape(1, -1, 1)
        yM = loc.dM1[1][:Ly].reshape(1, -1, 1)
        zK = zext(loc.dK1[2]).reshape(1, 1, -1)
        zM = zext(loc.dM1[2]).reshape(1, 1, -1)
        return xK * yM * zM + xM * (yK * zM + yM * zK)

    def _ext2(self, t, hx, hy):
        t = _ext_axis(t, hy, 1, AY, self.sy)
        return _ext_axis(t, hx, 0, AX, self.sx)

    def _to_full(self, x):
        """Trimmed per-shard state -> full consistent pencil slab: the
        duplicated planes come from the right y/x neighbours (the x payload
        is the y-APPENDED state, so the corner point rides along); Dirichlet
        planes re-padded with zeros."""
        if self.sy == 1:
            py = jnp.zeros_like(x[:, :1])
        else:
            bwd = [(j + 1, j) for j in range(self.sy - 1)]
            py = jax.lax.ppermute(x[:, :1], AY, bwd)
        x = jnp.concatenate([x, py], axis=1)
        if self.sx == 1:
            px = jnp.zeros_like(x[:1])
        else:
            bwd = [(i + 1, i) for i in range(self.sx - 1)]
            px = jax.lax.ppermute(x[:1], AX, bwd)
        x = jnp.concatenate([x, px], axis=0)
        if self._zp:
            x = x[:, :, : self._dims[3]]
        return jnp.pad(x, ((0, 0), (0, 0), (0, 1)))

    def _steps(self, r, d, x, k0: int = 0, rho: float | None = None):
        from ..ops.pallas_cheb2 import _roundup8

        p = self.op_cheb2.degree
        Hd = _roundup8(2 * p)
        Hr = _roundup8(p)
        sigma1 = self.theta / self.delta
        if rho is None:
            rho = 1.0 / sigma1
        n = self.degree - 1
        k = k0
        while k < n:
            rho1 = 1.0 / (2.0 * sigma1 - rho)
            if k + 1 == n:
                # odd tail: ONE step as a zero-coefficient pair — step 2
                # collapses to the identity (d2 = 0·d1 + 0·r2/diag = 0,
                # x2 = x1), so "cheb2l" returns exactly the single-step x'
                zero = jnp.zeros_like(self.delta)
                scal = jnp.stack([
                    rho1 * rho, 2.0 * rho1 / self.delta, zero, zero,
                ]).astype(jnp.float32)
                outs = self.op_cheb2.steps2(
                    self._ext2(d, 2 * p, Hd), self._ext2(r, p, Hr), x,
                    scal, "cheb2l", sdtype="f32",
                )
                return outs[0]
            rho2 = 1.0 / (2.0 * sigma1 - rho1)
            scal = jnp.stack([
                rho1 * rho, 2.0 * rho1 / self.delta,
                rho2 * rho1, 2.0 * rho2 / self.delta,
            ]).astype(jnp.float32)
            last = k + 2 == n
            outs = self.op_cheb2.steps2(
                self._ext2(d, 2 * p, Hd), self._ext2(r, p, Hr), x,
                scal, "cheb2l" if last else "cheb2", sdtype="f32",
            )
            if last:
                return outs[0]
            r, d, x = outs
            rho = rho2
            k += 2
        return x

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        """Preconditioner vmult with x0 = 0 on a masked full pencil slab.

        Entry pair in mode "cheb2f0": d0 derived IN-KERNEL from the
        halo-extended b window, exactly like the single-chip and 1D-slab
        paths (no materialized r0/d0 HBM streams for the first two
        steps)."""
        from ..ops.pallas_cheb2 import _roundup8

        bt = self._trim(b)
        n = self.degree - 1
        if n >= 2:
            p = self.op_cheb2.degree
            sigma1 = self.theta / self.delta
            rho = 1.0 / sigma1
            rho1 = 1.0 / (2.0 * sigma1 - rho)
            rho2 = 1.0 / (2.0 * sigma1 - rho1)
            scal = jnp.stack([
                rho1 * rho, 2.0 * rho1 / self.delta,
                rho2 * rho1, 2.0 * rho2 / self.delta, self.theta,
            ]).astype(jnp.float32)
            mode = "cheb2f0l" if n == 2 else "cheb2f0"
            outs = self.op_cheb2.steps2(
                self._ext2(bt, 2 * p, _roundup8(2 * p)), None, None,
                scal, mode, sdtype="f32",
            )
            if n == 2:
                return self._to_full(outs[0])
            r, d, x = outs
            return self._to_full(self._steps(r, d, x, k0=2, rho=rho2))
        d0 = bt / (self.theta * self._diag_trimmed())
        return self._to_full(self._steps(bt, d0, d0))

    def smooth(self, u: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        r0 = self._trim(rhs - self.op.apply(u))
        d0 = r0 / (self.theta * self._diag_trimmed())
        x0 = self._trim(u) + d0
        return self._to_full(self._steps(r0, d0, x0))


@pytree_dataclass
class Gather2DTransfer:
    """Boundary transfer between a pencil-SHARDED fine level and a REPLICATED
    coarse level on a 2D device mesh (the 2D analog of
    parallel/sharding.py:GatherTransfer; reference coarsening to the base
    mesh: source/geometric_multigrid/program.cc:137-147)."""

    sx: int = static_field()
    sy: int = static_field()
    stride_x: int = static_field()
    nx_pts: int = static_field()
    stride_y: int = static_field()
    ny_pts: int = static_field()
    local: Transfer = None  # full-grid transfer for the level pair

    def _assemble_full(self, f: jnp.ndarray) -> jnp.ndarray:
        gx = jax.lax.all_gather(f, AX)  # [sx, Nx_loc, Ny_loc, ...]
        f = jnp.concatenate(
            [gx[0]] + [gx[s][1:] for s in range(1, self.sx)], axis=0
        )
        gy = jax.lax.all_gather(f, AY)  # [sy, Nx, Ny_loc, ...]
        return jnp.concatenate(
            [gy[0]] + [gy[s][:, 1:] for s in range(1, self.sy)], axis=1
        )

    def restrict(self, f: jnp.ndarray) -> jnp.ndarray:
        return self.local.restrict(self._assemble_full(f))

    def restrict_and_add(self, dst, f):
        return dst + self.restrict(f)

    def prolongate(self, c_full: jnp.ndarray) -> jnp.ndarray:
        ff = self.local.prolongate(c_full)
        ix = jax.lax.axis_index(AX)
        iy = jax.lax.axis_index(AY)
        ff = jax.lax.dynamic_slice_in_dim(
            ff, ix * self.stride_x, self.nx_pts, axis=0
        )
        return jax.lax.dynamic_slice_in_dim(
            ff, iy * self.stride_y, self.ny_pts, axis=1
        )

    def prolongate_and_add(self, dst, c_full):
        return dst + self.prolongate(c_full)


@dataclasses.dataclass
class Sharded2DStats:
    iterations: int
    residual_norm: float
    converged: bool
    solution_l2_norm: float
    n_dofs: int
    mesh_shape: tuple


class Sharded2DGeometricPoisson:
    """3D h-multigrid Poisson over a 2D device mesh (x-y pencils)."""

    def __init__(
        self,
        dim: int,
        degree: int,
        refinements: int,
        mesh_shape: tuple[int, int],
        devices=None,
        dtype=jnp.float64,
        variant: str = "kron",
        pallas_interpret: bool = False,
        pallas_zpad: int | None = None,
    ):
        if dim < 2:
            raise ValueError("2D pencil sharding needs dim >= 2")
        self.pallas_interpret = pallas_interpret
        # explicit lane padding for the FINEST level (coarser levels follow
        # the lane_pad policy) — interpret-mode tests use this
        self.pallas_zpad = pallas_zpad
        sx, sy = mesh_shape
        if devices is None:
            devices = jax.devices()
        if len(devices) < sx * sy:
            raise ValueError("not enough devices for the mesh shape")
        self.sx, self.sy = sx, sy
        self.dtype = dtype
        self.dim = dim
        self.degree = degree
        min_ref = max(
            int(math.ceil(math.log2(max(sx, 1)))),
            int(math.ceil(math.log2(max(sy, 1)))),
        )
        if refinements < min_ref:
            raise ValueError(f"need >= {min_ref} refinements")
        # replicate levels below shard granularity so the hierarchy reaches
        # the 1-cell base mesh (see parallel/poisson.py)
        self.n_replicated = min_ref
        self.spaces = [
            FESpace(HyperCubeMesh(dim, r), degree)
            for r in range(0, refinements + 1)
        ]
        self.mesh = Mesh(
            np.array(devices[: sx * sy]).reshape(sx, sy), (AX, AY)
        )

        R = self.n_replicated
        levels = []
        for i, sp in enumerate(self.spaces):
            lvl = self._build_level(
                sp, coarse=(i == 0), variant=variant, replicated=(i < R)
            )
            if i == 0:
                transfer = None
            elif i < R:
                transfer = _tile_tree2(
                    make_h_transfer(self.spaces[i - 1], sp, dtype), sx, sy
                )
            elif i == R:
                p = sp.degree
                nlx = sp.mesh.cells_per_axis // sx
                nly = sp.mesh.cells_per_axis // sy
                transfer = Gather2DTransfer(
                    sx=sx, sy=sy,
                    stride_x=nlx * p, nx_pts=nlx * p + 1,
                    stride_y=nly * p, ny_pts=nly * p + 1,
                    local=_tile_tree2(
                        make_h_transfer(self.spaces[i - 1], sp, dtype), sx, sy
                    ),
                )
            else:
                transfer = self._build_transfer(self.spaces[i - 1], sp)
            levels.append(
                MGLevel(op=lvl.op, smoother=lvl.smoother, transfer=transfer)
            )
        self.levels_stacked = tuple(levels)
        fine = self.spaces[-1]
        n = fine.mesh.cells_per_axis
        wx = self._dotw(n, sx)
        wy = self._dotw(n, sy)
        # [sx, sy, N_locx, N_locy]
        self.dot_w = jnp.asarray(
            np.einsum("ia,jb->ijab", wx, wy), dtype
        )
        self._solve_jit = None

    def _dotw(self, n, S):
        from .sharding import dot_weights_axis0

        return dot_weights_axis0(n, self.degree, S)

    def _build_level(
        self, sp: FESpace, coarse: bool, variant: str, replicated: bool = False
    ) -> MGLevel:
        sx, sy = self.sx, self.sy
        dtype = self.dtype
        dim = sp.dim
        p = sp.degree
        n = sp.mesh.cells_per_axis

        if replicated:
            op_plain = make_laplace(
                sp, dtype, variant="kron" if variant == "pallas" else variant
            )
            v0 = _pseudo_random_grid(sp.grid_shape, dtype) * sp.free_mask()
            n_iter = min(sp.n_dofs, 128) if coarse else 10
            mn, mx = estimate_eigenvalues(
                op_plain, None, n_iter, jnp.asarray(v0, dtype)
            )
            rng = 1e-3 if coarse else 15.0
            alpha, beta, deg = chebyshev_bounds(mn, mx, rng,
                                                None if coarse else 5)
            smoother = Chebyshev(
                degree=deg, op=None, inv_diag=None,
                theta=_tile2(np.full((), (beta + alpha) / 2.0), sx, sy, dtype),
                delta=_tile2(np.full((), (beta - alpha) / 2.0), sx, sy, dtype),
            )
            return MGLevel(op=_tile_tree2(op_plain, sx, sy),
                           smoother=smoother, transfer=None)
        if variant == "pallas":
            zp = self.pallas_zpad if (
                getattr(self, "pallas_zpad", None) is not None
                and sp is self.spaces[-1]) else None
            op2d = _build_stacked_pallas2d(
                sp, sx, sy, dtype, interpret=self.pallas_interpret, zpad=zp
            )
            if op2d is not None:
                twin = make_laplace(sp, dtype, variant="kron")
                v0 = _pseudo_random_grid(sp.grid_shape, dtype) * sp.free_mask()
                n_iter = sp.n_dofs if coarse else 10
                mn, mx = estimate_eigenvalues(
                    twin, None, n_iter, jnp.asarray(v0, dtype)
                )
                rng = 1e-3 if coarse else 15.0
                alpha, beta, deg = chebyshev_bounds(
                    mn, mx, rng, None if coarse else 5
                )
                smoother = None
                if (not coarse and deg is not None and deg >= 2
                        and os.environ.get("PMG_CHEB2", "1") == "1"):
                    # production fast path on the 2D pencil mesh: the
                    # recurrence runs as xext+yext cheb2 pairs; an odd
                    # step count runs its tail as a zero-coefficient pair
                    # (see ShardedFused2DChebyshev._steps)
                    cheb2_2d = _build_stacked_cheb2_2d(
                        sp, sx, sy, dtype, interpret=self.pallas_interpret,
                        zpad=zp,
                    )
                    if cheb2_2d is not None:
                        smoother = ShardedFused2DChebyshev(
                            sx=sx, sy=sy, degree=deg,
                            op=None,  # wired to the level op in shard_map
                            op_cheb2=cheb2_2d,
                            theta=_tile2(np.full((), (beta + alpha) / 2.0),
                                         sx, sy, dtype),
                            delta=_tile2(np.full((), (beta - alpha) / 2.0),
                                         sx, sy, dtype),
                        )
                if smoother is None:
                    smoother = Chebyshev(
                        degree=deg, op=None, inv_diag=None,
                        theta=_tile2(np.full((), (beta + alpha) / 2.0), sx,
                                     sy, dtype),
                        delta=_tile2(np.full((), (beta - alpha) / 2.0), sx,
                                     sy, dtype),
                    )
                return MGLevel(op=op2d, smoother=smoother, transfer=None)
            variant = "kron"  # ineligible level: assembled-Kronecker path
        b = sp.basis
        qm = np.array(1.0)
        for _ in range(dim):
            qm = np.multiply.outer(qm, b.q_weights)
        qm = qm * sp.mesh.h ** (dim - 2)
        m1 = sp.free_mask_1d()
        gK, gM = diagonal_1d_factors(sp)
        Kg = Mg = None
        if variant == "kron":
            from ..ops.laplace import assembled_1d_matrices

            K1, M1 = assembled_1d_matrices(sp)
            Kx, Mx = _partial_assembled_1d(sp, n // sx)
            Ky, My = _partial_assembled_1d(sp, n // sy)
            Kg = (
                _tile2(Kx, sx, sy, dtype),
                _tile2(Ky, sx, sy, dtype),
            ) + (_tile2(K1, sx, sy, dtype),) * (dim - 2)
            Mg = (
                _tile2(Mx, sx, sy, dtype),
                _tile2(My, sx, sy, dtype),
            ) + (_tile2(M1, sx, sy, dtype),) * (dim - 2)
        # separable per-axis factors: axis 0 partitioned over sx (broadcast
        # along sy), axis 1 over sy, remaining axes replicated whole
        from .sharding import partition_axis0

        def sep2(v):
            vx = partition_axis0(v, n, p, sx)  # [sx, N_locx]
            vy = partition_axis0(v, n, p, sy)  # [sy, N_locy]
            return (
                jnp.asarray(
                    np.broadcast_to(vx[:, None], (sx, sy) + vx.shape[1:]), dtype
                ),
                jnp.asarray(
                    np.broadcast_to(vy[None], (sx, sy) + vy.shape[1:]), dtype
                ),
            ) + (_tile2(v, sx, sy, dtype),) * (dim - 2)

        op = LaplaceOperator(
            dim=dim,
            degree=p,
            n=(n // sx, n // sy) + (n,) * (dim - 2),
            variant=variant,
            B=_tile2(b.B, sx, sy, dtype),
            Dco=_tile2(b.Dco, sx, sy, dtype),
            qmetric=_tile2(qm, sx, sy, dtype),
            mask1=sep2(m1),
            dK1=sep2(gK),
            dM1=sep2(gM),
            Kg=Kg,
            Mg=Mg,
        )
        twin = make_laplace(sp, dtype)
        v0 = _pseudo_random_grid(sp.grid_shape, dtype) * sp.free_mask()
        if coarse:
            mn, mx = estimate_eigenvalues(
                twin, twin.inv_diag, min(sp.n_dofs, 128), jnp.asarray(v0, dtype)
            )
            alpha, beta, deg = chebyshev_bounds(mn, mx, 1e-3, None)
        else:
            mn, mx = estimate_eigenvalues(
                twin, twin.inv_diag, 10, jnp.asarray(v0, dtype)
            )
            alpha, beta, deg = chebyshev_bounds(mn, mx, 15.0, 5)
        smoother = Chebyshev(
            degree=deg,
            op=None,
            inv_diag=None,  # derived from the operator's 1D factors
            theta=_tile2(np.full((), (beta + alpha) / 2.0), sx, sy, dtype),
            delta=_tile2(np.full((), (beta - alpha) / 2.0), sx, sy, dtype),
        )
        return MGLevel(op=op, smoother=smoother, transfer=None)

    def _build_transfer(self, coarse: FESpace, fine: FESpace) -> Transfer:
        sx, sy = self.sx, self.sy
        dtype = self.dtype
        p = coarse.degree
        dim = coarse.dim
        n_c = coarse.mesh.cells_per_axis
        M1 = h_prolongation_matrix_1d(p)
        wf_full = _weights_1d(n_c, 2 * p) * fine.free_mask_1d()
        mc_full = coarse.free_mask_1d()

        def part1(v, n_cells, S, stride):
            from .sharding import partition_axis0

            return partition_axis0(v, n_cells, stride, S)

        wfx = part1(wf_full, 2 * n_c, sx, p)  # [sx, Nf_loc]
        wfy = part1(wf_full, 2 * n_c, sy, p)
        mcx = part1(mc_full, n_c, sx, p)
        mcy = part1(mc_full, n_c, sy, p)
        # broadcast to [sx, sy, .]
        wmask_f = (
            jnp.asarray(np.broadcast_to(wfx[:, None], (sx, sy) + wfx.shape[1:]), dtype),
            jnp.asarray(np.broadcast_to(wfy[None], (sx, sy) + wfy.shape[1:]), dtype),
        ) + (_tile2(wf_full, sx, sy, dtype),) * (dim - 2)
        mask_c1 = (
            jnp.asarray(np.broadcast_to(mcx[:, None], (sx, sy) + mcx.shape[1:]), dtype),
            jnp.asarray(np.broadcast_to(mcy[None], (sx, sy) + mcy.shape[1:]), dtype),
        ) + (_tile2(mc_full, sx, sy, dtype),) * (dim - 2)
        return Transfer(
            dim=dim,
            n_coarse=(n_c // sx, n_c // sy) + (n_c,) * (dim - 2),
            stride_c=p,
            stride_f=2 * p,
            M1=_tile2(M1, sx, sy, dtype),
            wmask_f=wmask_f,
            mask_c1=mask_c1,
        )

    def _assemble_local(self, levels_stacked):
        R = getattr(self, "n_replicated", 0)
        out = []
        for i, lvl in enumerate(levels_stacked):
            op_loc = _unstack(_unstack(lvl.op))
            if i < R or isinstance(op_loc, ShardedPallas2DLaplace):
                op_w = op_loc  # replicated plain op / self-contained wrapper
            else:
                op_w = Sharded2DLaplace(sx=self.sx, sy=self.sy, local=op_loc)
            sm_st = lvl.smoother
            if isinstance(sm_st, ShardedFused2DChebyshev):
                sm = dataclasses.replace(
                    _unstack(_unstack(sm_st)), op=op_w
                )
            else:
                sm = Chebyshev(
                    degree=sm_st.degree,
                    op=op_w,
                    inv_diag=None,  # op_w.inv_diag from local 1D factors
                    theta=sm_st.theta[0, 0],
                    delta=sm_st.delta[0, 0],
                )
            if lvl.transfer is None:
                tr = None
            elif i <= R and R > 0:
                # plain replicated transfer (i < R) or Gather2DTransfer (i == R)
                tr = _unstack(_unstack(lvl.transfer))
            else:
                tr = Sharded2DTransfer(
                    sx=self.sx, sy=self.sy,
                    local=_unstack(_unstack(lvl.transfer)),
                )
            out.append(MGLevel(op=op_w, smoother=sm, transfer=tr))
        return tuple(out)

    def solve(self, rtol: float = 1e-12, verbose: bool = False):
        fine = self.spaces[-1]
        sx, sy = self.sx, self.sy
        n = fine.mesh.cells_per_axis
        rhs = assemble_rhs(fine)
        rhs_st = jnp.asarray(
            partition_2d(rhs, n, self.degree, sx, sy), self.dtype
        )

        if self._solve_jit is None:

            def solve_local(levels_stacked, rhs_s, dot_w_s):
                levels = self._assemble_local(levels_stacked)
                rhs_l = rhs_s[0, 0]
                w = dot_w_s[0, 0]
                wfull = w.reshape(w.shape + (1,) * (self.dim - 2))

                def dot(a, b):
                    s = jnp.vdot(a * wfull, b)
                    return jax.lax.psum(jax.lax.psum(s, AX), AY)

                mg = VCycle(
                    pre_smoothing_steps=2, post_smoothing_steps=2,
                    levels=levels,
                )
                res = cg(levels[-1].op.apply, rhs_l, mg.apply, rtol=rtol,
                         dot=dot)
                return (res.x[None, None], res.iterations,
                        res.residual_norm, res.converged)

            self._solve_jit = jax.jit(
                jax.shard_map(
                    solve_local,
                    mesh=self.mesh,
                    in_specs=(P(AX, AY), P(AX, AY), P(AX, AY)),
                    out_specs=(P(AX, AY), P(), P(), P()),
                    check_vma=False,
                )
            )
        x_st, iters, resnorm, conv = self._solve_jit(
            self.levels_stacked, rhs_st, self.dot_w
        )
        x = unpartition_2d(np.asarray(x_st), n, self.degree, sx, sy)
        stats = Sharded2DStats(
            iterations=int(iters),
            residual_norm=float(resnorm),
            converged=bool(conv),
            solution_l2_norm=l2_norm(fine, x),
            n_dofs=fine.n_dofs,
            mesh_shape=(sx, sy),
        )
        if verbose:
            print(
                f" {stats.n_dofs} DoFs over a {sx}x{sy} device mesh; "
                f"converged in {stats.iterations} iterations; "
                f"norm {stats.solution_l2_norm:.6g}"
            )
        return x, stats
