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
from .laplace import (
    assembled_1d_matrices,
    best_xla_variant,
    diagonal_1d_factors,
    make_laplace,
)


def to_bands(W: np.ndarray, p: int) -> np.ndarray:
    """[L, L] banded matrix -> bands [2p+1, L]: bands[p+o, i] = W[i, i+o]
    (zero where i+o is out of range, which also kills roll wrap-around)."""
    L = W.shape[0]
    bands = np.zeros((2 * p + 1, L))
    for o in range(-p, p + 1):
        for i in range(max(0, -o), min(L, L - o)):
            bands[p + o, i] = W[i, i + o]
    return bands


def lane_pad(space: FESpace) -> int:
    """Zero-padding of the z (lane) extent to the next 128-multiple.

    Mosaic DMA lane slices must be 128-aligned, so grids whose n*p is not a
    128-multiple (Q5: 320, Q7: 224) store kernel-facing z arrays padded to
    Zp = roundup(n*p, 128).  The pad region is structurally inert: the band
    matrices are zero there (to_bands of the zero-extended 1D matrices), so
    padded output lanes are exactly zero and padded input lanes contribute
    nothing — the same mechanism that already drops the global Dirichlet
    last plane.

    Sub-128-lane grids (the coarse r<=4 tail) pad UP to one full 128-lane
    tile on TPU backends so coarse levels ride the fused smoother kernels
    too (the coarse-recursion lever, VERDICT r3 item 2 — pad lanes are
    inert zeros, so the extra z work is pure bandwidth on levels where
    per-kernel fixed costs dominate; measured r=6 Q4 16.81 -> 16.12 ms =
    1.053e9 DoF/s, experiments/r4_batch4.py).  Kernels with <128 lanes
    crash Mosaic, so without the pad-up these levels are ineligible — the
    CPU default, which keeps interpret-mode tests on their small exact
    extents.  PMG_ZPAD_UP=0/1 overrides either default."""
    import os

    Z = space.mesh.cells_per_axis * space.degree
    if Z < 128:
        on = os.environ.get("PMG_ZPAD_UP")
        if on is None:
            on = "0" if jax.default_backend() == "cpu" else "1"
        return 128 - Z if on == "1" else 0
    return (-Z) % 128


def pallas_eligible(
    space: FESpace, bx: int = 8, by: int = 8, zpad: int | None = None
) -> bool:
    """``zpad=None`` uses the default :func:`lane_pad` policy (sub-128-lane
    grids ineligible).  An explicit ``zpad`` admits any grid whose PADDED
    lane extent n*p + zpad is a 128-multiple >= 128 — coarse levels (r<=4,
    n*p < 128) can pad up to one full 128-lane tile so the whole hierarchy
    stays on the fused kernels (the pad lanes are inert zeros, so the extra
    z work is pure bandwidth on a level where fixed costs dominate)."""
    n, p = space.mesh.cells_per_axis, space.degree
    if zpad is None:
        # pad to the next 128-multiple per the lane_pad policy (which
        # admits sub-128-lane grids only under PMG_ZPAD_UP=1)
        lanes_ok = n * p + lane_pad(space) >= 128
    else:
        Z = n * p + zpad
        lanes_ok = Z >= 128 and Z % 128 == 0 and (zpad == 0 or zpad >= p)
    return (
        space.dim == 3
        and lanes_ok
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
    # compute core: "banded" = exact f32 roll+FMA on the VPU (the CG/residual
    # operator); "mxu" = bf16 dense matmuls on the systolic array with f32
    # accumulation (smoother-grade: ~1e-3 relative operator perturbation,
    # which Chebyshev smoothing absorbs — see tests/test_mixed.py)
    core: str = static_field(default="banded")
    # x-axis constraint masking: "iota" = both global x-ends are Dirichlet
    # (single-chip cube); "vector" = multiply by the mask1[0] window instead
    # — per-SHARD data, so slab operators under shard_map keep interior
    # shard boundaries unmasked and emit raw partial planes for halo_sum
    # (reference parity: one hot kernel for serial and MPI runs,
    # include/operators/portable_laplace_operator.h:557-719)
    xmask: str = static_field(default="iota")
    # y-axis analog, for 2D pencil decompositions (mask1[1] per-shard slice)
    ymask: str = static_field(default="iota")
    # z-lane zero padding (see lane_pad): kernel state carries n2*p + zpad
    # lanes; pad lanes are identically zero (band rows there are zero)
    zpad: int = static_field(default=0)
    bands: tuple = None  # (Kzb, Mzb, Kxb, Mxb, Kyb, Myb)
    dense_mats: tuple = None  # (Kz, Mz, Kx, Mx, KyB, MyB) bf16 ("mxu" core)
    # separable mask/diagonal factors (see LaplaceOperator: O(N) storage so
    # jit-captured constants stay tiny even at 135M DoFs)
    mask1: tuple = None  # per-axis [N_d]
    dK1: tuple = None
    dM1: tuple = None

    @property
    def grid_shape(self):
        return tuple(nd * self.degree + 1 for nd in self.n)

    @property
    def dtype(self):
        return self.mask1[0].dtype

    def _bc(self, v, ax):
        shp = [1] * self.dim
        shp[ax] = v.shape[0]
        return v.reshape(shp)

    @property
    def mask(self):
        m = self._bc(self.mask1[0], 0)
        for d in range(1, self.dim):
            m = m * self._bc(self.mask1[d], d)
        return m

    @property
    def inv_diag(self):
        diag = None
        for k in range(self.dim):
            term = self._bc(self.dK1[0] if k == 0 else self.dM1[0], 0)
            for d in range(1, self.dim):
                term = term * self._bc(
                    self.dK1[d] if d == k else self.dM1[d], d
                )
            diag = term if diag is None else diag + term
        m = self.mask
        return 1.0 / (diag * m + (1.0 - m))

    @property
    def n_dofs(self):
        out = 1
        for s in self.grid_shape:
            out *= s
        return out

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """Full vmult: A_eff = M A M + (I - M) (pad + combine around _run)."""
        u = u.reshape(self.grid_shape)
        uk = u
        if self.zpad:
            # kernel DMA reads Zp = n2*p + zpad lanes; the full grid has
            # n2*p + 1 — extend with zeros (inert: pad band rows are zero)
            uk = jnp.pad(u, ((0, 0), (0, 0), (0, self.zpad - 1)))
        au = self._run("apply", uk)
        if self.zpad:
            au = au[:, :, : self.grid_shape[2] - 1]
        # global last planes are Dirichlet faces (mask == 0 there): zero-pad
        # back to the full grid; XLA fuses pad + mask combine into one pass
        au = jnp.pad(au, ((0, 1), (0, 1), (0, 1)))
        m = self.mask
        return m * au + (1.0 - m) * u

    def _run(self, mode: str, u: jnp.ndarray, blocked_ins=(), scal=None,
             sdtype: str = "f32"):
        """Shared block-grid / carry-plane kernel skeleton, three programs:

        * "apply":    outv = (M A M u) trimmed to (N0-1, N1-1, Z); u full.
        * "residual": the first half of a Chebyshev smoothing step, fused:
                      r0 = rhs - M A M u (u, rhs full), d0 = r0/(theta·diag);
                      blocked_ins = (rhs,), scal = [[theta, ·]].
        * "residual3t": trimmed-state variant of "residual" that also seeds
                      the recurrence accumulator: u, rhs TRIMMED, outputs
                      (r0, d0, x0 = u + d0) — the whole smoothing step then
                      runs kernel-to-kernel with zero XLA elementwise passes
                      (the final recurrence x IS the smoothed u).
        * "residual1t": trimmed r0 = rhs - M A M u only (restriction prep);
                      no diagonal factors, no scalars.
        * "cheb":     one fused Chebyshev recurrence step on TRIMMED state
                      (constrained entries identically zero by invariant):
                      r' = r - M A M d; d' = c0 d + c1 r'/diag; x' = x + d';
                      u = d (trimmed), blocked_ins = (r, x) (trimmed),
                      scal = [[c0, c1]].
        * "chebf" / "residual3f" / "residual1f": slab-sharded variants of
                      cheb / residual3t / residual1t where u is X-FULL
                      (n0*p + 1 rows: the trimmed per-shard state plus the
                      neighbour's first plane appended by a 1-plane
                      ppermute) while y/z stay trimmed.  Interior shard
                      boundaries need the extra input plane for the
                      slab-local stencil; outputs stay trimmed and the
                      caller corrects plane 0 with the halo'd partial
                      contribution (parallel/sharding.py:
                      ShardedFusedChebyshev).

        Fused modes cut the smoother's elementwise HBM traffic: the
        recurrence updates ride the operator kernel's DMA streams instead of
        separate XLA passes (the analog of the reference folding the
        Chebyshev axpys into its cell loop would not be possible in Kokkos —
        this is a TPU-side win from kernel fusion).
        """
        p = self.degree
        n0, n1, n2 = self.n
        N0, N1 = n0 * p + 1, n1 * p + 1
        bx, by = self.bx, self.by
        # Z is the kernel lane extent: the real n2*p lanes plus the inert
        # zero pad (lane_pad).  All kernel-side arrays carry Z lanes.
        X, Y, Z = bx * p + 1, by * p + 1, n2 * p + self.zpad
        nbi, nbj = n0 // bx, n1 // by
        byp, bxp = by * p, bx * p
        dtype = self.dtype
        udtype = u.dtype  # stencil-input storage (bf16 for the d stream)
        nb = 2 * p + 1
        core = self.core
        # x-trimmed input: the kernel's last block fetches X-1 rows and
        # zeroes the final window row ("f" modes carry the extra x plane)
        trimmed_in = mode in ("cheb", "chebl", "chebd", "chebdl",
                              "residual3t", "residual1t")

        if byp % 8 != 0:
            raise ValueError("pallas kernel requires by*p % 8 == 0")

        n_mats = {"banded": 6, "mxu": 6, "mxu3": 12, "hyb3": 10}[core]
        n_facs = 0 if mode in ("apply", "residual1t", "residual1f") else 6
        n_scal = 0 if scal is None else 1
        n_bins = len(blocked_ins)
        # recurrence-state storage dtype: "bf16" stores the r/d streams in
        # bfloat16 (HALF the smoother's HBM traffic on those streams).  The
        # x accumulator and every input that is solution- or rhs-scale stay
        # f32, and all arithmetic is f32 in-VMEM — only the stored r/d are
        # rounded.  The mxu recurrence core rounds d to bf16 for the matmuls
        # anyway, so A·d loses nothing; rounding r' perturbs the recurrence
        # at recurrence-state scale, which Chebyshev smoothing absorbs (the
        # level residuals stay on the exact f32 kernels — see CLAUDE.md).
        sd = jnp.bfloat16 if sdtype == "bf16" else dtype
        # "chebl"/"chebdl": LAST recurrence step — nothing consumes r' OR
        # d', so skip both writes (two full HBM streams per smoothing step);
        # "chebd"/"chebdl": x == d on entry (apply()'s zero-initial-guess
        # first step), so skip the duplicate x read
        out_dtypes = {"apply": (dtype,), "residual": (dtype, dtype),
                      "residual3t": (sd, sd, dtype),
                      "residual1t": (dtype,),
                      "cheb": (sd, sd, dtype), "chebf": (dtype,) * 3,
                      "residual3f": (dtype,) * 3, "residual1f": (dtype,),
                      "chebl": (dtype,), "chebd": (sd, sd, dtype),
                      "chebdl": (dtype,)}[mode]
        n_outs = len(out_dtypes)
        xmask_vec = self.xmask == "vector"
        n_xm = 1 if xmask_vec else 0
        ymask_vec = self.ymask == "vector"
        n_ym = 1 if ymask_vec else 0

        def kernel(u_hbm, *refs):
            mat_refs = refs[:n_mats]
            pos = n_mats
            fac_refs = refs[pos: pos + n_facs]
            pos += n_facs
            xm_r = refs[pos] if xmask_vec else None
            pos += n_xm
            ym_r = refs[pos] if ymask_vec else None
            pos += n_ym
            scal_r = refs[pos] if n_scal else None
            pos += n_scal
            bin_refs = refs[pos: pos + n_bins]
            pos += n_bins
            if mode == "apply":
                (out_hbm, slab, outs, carry_y, carry_x, sems) = refs[pos:]
            else:
                out_refs = refs[pos: pos + n_outs]
                (slab, carry_y, carry_x, sems) = refs[pos + n_outs:]
            if core == "hyb3":
                # z band arrays + hi/lo dense x/y matrices
                (Az_r, Bz_r, Ax_r, Bx_r, Ay_r, By_r,
                 Axl_r, Bxl_r, Ayl_r, Byl_r) = mat_refs
            else:
                (Az_r, Bz_r, Ax_r, Bx_r, Ay_r, By_r) = mat_refs[:6]
            i = pl.program_id(0)
            j = pl.program_id(1)
            k = i * nbj + j
            islot = jax.lax.rem(k, jnp.int32(2))

            # ---- double-buffered input: prefetch block k+1 while block k
            # computes (the write-back side is double-buffered symmetrically
            # below).  The y-window is the aligned byp-row body plus the next
            # 8 rows (zeros on the last j-block).  Trimmed inputs lack the
            # global last x-plane: the last i-block fetches X-1 rows and
            # zeroes the window's final row (it is masked out anyway, but
            # VMEM garbage may be non-finite and 0*inf = nan).
            def in_main(slot, ii, jj, rows):
                return pltpu.make_async_copy(
                    u_hbm.at[pl.ds(ii * bx * p, rows), pl.ds(jj * byp, byp),
                             pl.ds(0, Z)],
                    slab.at[slot, 0:rows, 0:byp, :], sems.at[slot],
                )

            def in_tail(slot, ii, jj, rows):
                return pltpu.make_async_copy(
                    u_hbm.at[pl.ds(ii * bx * p, rows),
                             pl.ds((jj + 1) * byp, 8), pl.ds(0, Z)],
                    slab.at[slot, 0:rows, byp: byp + 8, :], sems.at[2 + slot],
                )

            def on_rows(ii, fn):
                """Run fn with the static row count of block-row ii (the last
                block of a trimmed input is one row short — DMA sizes must be
                static, so branch with pl.when).  With a single block row the
                X-row variant would trace an out-of-bounds slice: skip it."""
                if not trimmed_in:
                    fn(X)
                    return
                if nbi == 1:
                    fn(X - 1)
                    return

                @pl.when(ii == nbi - 1)
                def _():
                    fn(X - 1)

                @pl.when(ii < nbi - 1)
                def _():
                    fn(X)

            def start_fetch(slot, ii, jj):
                on_rows(ii, lambda rows: in_main(slot, ii, jj, rows).start())
                if trimmed_in:

                    @pl.when(ii == nbi - 1)
                    def _():
                        slab[slot, X - 1: X, :, :] = jnp.zeros(
                            (1, byp + 8, Z), udtype
                        )

                if ymask_vec:
                    # pencil slabs: the last y-block's window row byp is the
                    # DUPLICATED interior plane — always fetch the tail (the
                    # wrapper pads the input y extent by 7 rows so the 8-row
                    # aligned read stays in bounds)
                    on_rows(
                        ii, lambda rows: in_tail(slot, ii, jj, rows).start()
                    )
                else:

                    @pl.when(jj < nbj - 1)
                    def _():
                        on_rows(
                            ii,
                            lambda rows: in_tail(slot, ii, jj, rows).start(),
                        )

                    @pl.when(jj == nbj - 1)
                    def _():
                        slab[slot, :, byp: byp + 8, :] = jnp.zeros(
                            (X, 8, Z), udtype
                        )

            @pl.when(k == 0)
            def _():
                start_fetch(jnp.int32(0), i, j)

            @pl.when(k + 1 < nbi * nbj)
            def _():
                k1 = k + 1
                start_fetch(
                    1 - islot, k1 // nbj, jax.lax.rem(k1, jnp.int32(nbj))
                )

            on_rows(i, lambda rows: in_main(islot, i, j, rows).wait())

            if ymask_vec:
                on_rows(i, lambda rows: in_tail(islot, i, j, rows).wait())
            else:

                @pl.when(j < nbj - 1)
                def _():
                    on_rows(i, lambda rows: in_tail(islot, i, j, rows).wait())

            yi = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)
            if xmask_vec:
                mvx = xm_r[pl.ds(i * bxp, X), :, :]
            else:
                xi = jax.lax.broadcasted_iota(jnp.int32, (X, 1, 1), 0)
                mvx = jnp.logical_and(
                    jnp.logical_or(i > 0, xi > 0),
                    jnp.logical_or(i < nbi - 1, xi < X - 1),
                ).astype(dtype)
            if ymask_vec:
                mvy = ym_r[:, pl.ds(j * byp, Y), :]
            else:
                mvy = jnp.logical_and(
                    jnp.logical_or(j > 0, yi > 0),
                    jnp.logical_or(j < nbj - 1, yi < Y - 1),
                ).astype(dtype)

            um = slab[islot, :, :Y, :] * mvx * mvy

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

            if core == "banded":
                # exact f32: banded roll+FMA contractions on the VPU
                b, a = banded_pair(um, Bz_r, Az_r, 2)
                mb, kb = banded_pair(b, By_r, Ay_r, 1)
                ma = banded(a, By_r, 1)
                raw = banded(mb, Ax_r, 0) + banded(kb + ma, Bx_r, 0)
            elif core == "hyb3":
                # exact-grade hybrid: the z contractions stay banded f32 on
                # the VPU (the lane-axis rolls are cheap and exact; a dense
                # [Z,Z] matmul's flop waste grows with Z), while the small
                # y/x contractions run as hi/lo-split bf16 matmuls on the
                # MXU (~1e-7 relative).  VPU and MXU work overlap.
                bf = jnp.bfloat16

                def dy(t, w_r):
                    return jax.lax.dot_general(
                        w_r[...], t, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )

                def dx(t, w_r):
                    return jax.lax.dot_general(
                        w_r[...], t, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                def c3(d, t, whi_r, wlo_r):
                    hi = t.astype(bf)
                    lo = (t - hi.astype(jnp.float32)).astype(bf)
                    return d(hi, whi_r) + d(lo, whi_r) + d(hi, wlo_r)

                b, a = banded_pair(um, Bz_r, Az_r, 2)
                mb = c3(dy, b, By_r, Byl_r)
                kb = c3(dy, b, Ay_r, Ayl_r)
                ma = c3(dy, a, By_r, Byl_r)
                raw = c3(dx, mb, Ax_r, Axl_r) + c3(
                    dx, kb + ma, Bx_r, Bxl_r
                )
            else:
                # smoother-grade bf16 MXU core: every 1D contraction is a
                # dense matmul on the systolic array (inputs rounded to bf16,
                # f32 accumulation).  ~28x flop waste vs the 9-banded
                # structure, but the MXU's ~50x throughput advantage over
                # the VPU makes it the faster engine; the VPU keeps the
                # masking/carry elementwise work.
                bf = jnp.bfloat16

                def dz(t, w_r):  # contract lanes (z): [X,Y,Z] @ [Z,Z']
                    return jax.lax.dot_general(
                        t, w_r[...],
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                def dy(t, w_r):  # batched over x: [X,Y',Y] @ [X,Y,Z]
                    return jax.lax.dot_general(
                        w_r[...], t,
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                    )

                def dx(t, w_r):  # contract axis 0: [X',X] @ [X,Y,Z]
                    return jax.lax.dot_general(
                        w_r[...], t,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                if core == "mxu":
                    ub = um.astype(bf)
                    b = dz(ub, Bz_r).astype(bf)  # Mz u
                    a = dz(ub, Az_r).astype(bf)  # Kz u
                    mb = dy(b, By_r).astype(bf)
                    kb = dy(b, Ay_r)
                    ma = dy(a, By_r)
                    s = (kb + ma).astype(bf)
                    raw = dx(mb, Ax_r) + dx(s, Bx_r)
                else:
                    # "mxu3": f32-faithful via hi/lo bf16 splitting — the
                    # matrices ship as (hi, lo) pairs, the data splits in
                    # kernel; out = hi@Whi + lo@Whi + hi@Wlo (the dropped
                    # lo@Wlo term is O(2^-16) relative).  3x the matmuls of
                    # "mxu" but still MXU-engine speed, with ~1e-7 relative
                    # error — CG/residual-grade.
                    (Azl_r, Bzl_r, Axl_r, Bxl_r, Ayl_r, Byl_r) = mat_refs[6:]

                    def split(t):
                        hi = t.astype(bf)
                        lo = (t - hi.astype(jnp.float32)).astype(bf)
                        return hi, lo

                    def c3(d, t, whi_r, wlo_r):
                        hi, lo = split(t)
                        return d(hi, whi_r) + d(lo, whi_r) + d(hi, wlo_r)

                    b = c3(dz, um, Bz_r, Bzl_r)  # Mz u
                    a = c3(dz, um, Az_r, Azl_r)  # Kz u
                    mb = c3(dy, b, By_r, Byl_r)
                    kb = c3(dy, b, Ay_r, Ayl_r)
                    ma = c3(dy, a, By_r, Byl_r)
                    raw = c3(dx, mb, Ax_r, Axl_r) + c3(
                        dx, kb + ma, Bx_r, Bxl_r
                    )

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

            if mode == "apply":
                # double-buffered output write-back: start this block's DMA
                # and only wait for it one grid step later (before its slot
                # is reused), so compute overlaps the write.
                oslot = jax.lax.rem(k, jnp.int32(2))

                def out_dma(slot, ii, jj):
                    return pltpu.make_async_copy(
                        outs.at[slot],
                        out_hbm.at[pl.ds(ii * bx * p, X - 1),
                                   pl.ds(jj * byp, Y - 1), pl.ds(0, Z)],
                        sems.at[4 + slot],
                    )

                @pl.when(k >= 2)
                def _():
                    k2 = k - 2
                    out_dma(
                        oslot, k2 // nbj, jax.lax.rem(k2, jnp.int32(nbj))
                    ).wait()

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
                            1 - oslot, k1 // nbj,
                            jax.lax.rem(k1, jnp.int32(nbj)),
                        ).wait()
                return

            if mode in ("residual1t", "residual1f"):
                out_refs[0][...] = bin_refs[0][...] - outv
                return

            # ---- fused epilogues: the inverse diagonal is rebuilt in-VMEM
            # from per-axis 1D factors (cheaper than streaming a 3D diagonal
            # from HBM; VPU is idle while the MXU core runs the matmuls).
            # Constrained entries carry raw (unmasked) diagonal values — the
            # trimmed recurrence state is identically zero there.
            (xK_r, xM_r, yK_r, yM_r, zK_r, zM_r) = fac_refs
            xK = xK_r[pl.ds(i * bxp, bxp), :, :]
            xM = xM_r[pl.ds(i * bxp, bxp), :, :]
            yK = yK_r[:, pl.ds(j * byp, byp), :]
            yM = yM_r[:, pl.ds(j * byp, byp), :]
            zK = zK_r[...]
            zM = zM_r[...]
            diag = xK * yM * zM + xM * (yK * zM + yM * zK)

            def put(ix, val):
                # recurrence-state outputs may store bf16 (sdtype); the
                # in-VMEM value is always f32
                out_refs[ix][...] = val.astype(out_dtypes[ix])

            if mode in ("residual", "residual3t", "residual3f"):
                rhs_blk = bin_refs[0][...]
                theta = scal_r[0, 0]
                r0 = rhs_blk - outv
                put(0, r0)
                d0 = r0 / (theta * diag)
                put(1, d0)
                if mode in ("residual3t", "residual3f"):
                    # seed the recurrence accumulator: x0 = u + d0 (u is the
                    # kernel's stencil input, already resident in the slab)
                    put(2, slab[islot, : X - 1, 0:byp, :] + d0)
            else:  # "cheb" family
                d_blk = slab[islot, : X - 1, 0:byp, :].astype(dtype)
                r_blk = bin_refs[0][...].astype(dtype)
                if mode in ("chebd", "chebdl"):
                    x_blk = d_blk  # zero-initial-guess first step: x == d
                else:
                    x_blk = bin_refs[1][...]
                c0 = scal_r[0, 0]
                c1 = scal_r[0, 1]
                rn = r_blk - outv
                dn = c0 * d_blk + (c1 / diag) * rn
                if mode in ("chebl", "chebdl"):
                    # LAST step: only x' has a consumer
                    put(0, x_blk + dn)
                else:
                    put(0, rn)
                    put(1, dn)
                    put(2, x_blk + dn)

        mats = self.bands if core == "banded" else self.dense_mats
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
        ] * n_mats
        operands = list(mats)
        if n_facs:
            dKx, dKy, dKz = self.dK1
            dMx, dMy, dMz = self.dM1
            # pad z diagonal factors with ones: the trimmed recurrence state
            # is identically zero in the pad lanes, and 0 / diag needs a
            # finite nonzero diagonal there
            zdK = dKz[: n2 * p]
            zdM = dMz[: n2 * p]
            if self.zpad:
                zdK = jnp.pad(zdK, (0, self.zpad), constant_values=1.0)
                zdM = jnp.pad(zdM, (0, self.zpad), constant_values=1.0)
            operands += [
                dKx[: N0 - 1].reshape(-1, 1, 1),
                dMx[: N0 - 1].reshape(-1, 1, 1),
                dKy[: N1 - 1].reshape(1, -1, 1),
                dMy[: N1 - 1].reshape(1, -1, 1),
                zdK.reshape(1, 1, -1),
                zdM.reshape(1, 1, -1),
            ]
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        if xmask_vec:
            operands.append(self.mask1[0].reshape(-1, 1, 1))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if ymask_vec:
            operands.append(self.mask1[1].reshape(1, -1, 1))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if n_scal:
            operands.append(jnp.asarray(scal, jnp.float32).reshape(1, 2))
            in_specs.append(
                pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        blk = (bxp, byp, Z)
        blk_spec = pl.BlockSpec(blk, lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        for b_in in blocked_ins:
            operands.append(b_in)
            in_specs.append(blk_spec)

        if mode == "apply":
            out_specs = pl.BlockSpec(memory_space=pl.ANY)
            out_shape = jax.ShapeDtypeStruct((N0 - 1, N1 - 1, Z), dtype)
        else:
            out_specs = (blk_spec,) * n_outs
            out_shape = tuple(
                jax.ShapeDtypeStruct((N0 - 1, N1 - 1, Z), dt)
                for dt in out_dtypes
            )

        scratch = [pltpu.VMEM((2, X, byp + 8, Z), udtype)]
        if mode == "apply":
            scratch.append(pltpu.VMEM((2, X - 1, Y - 1, Z), dtype))
        scratch += [
            pltpu.VMEM((X, Z), dtype),
            pltpu.VMEM((2, nbj, Y, Z), dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ]
        inner = pl.pallas_call(
            kernel,
            grid=(nbi, nbj),
            in_specs=in_specs,
            out_specs=out_specs,
            # trimmed, fully-written outputs (the global last planes are
            # Dirichlet faces, re-added by a fused zero-pad in apply();
            # fused-mode state lives trimmed throughout the smoother)
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )
        return inner(u, *operands)

    vmult = apply


def _masked_z_matrices(K1, M1, m1, Zr, Z):
    """Dirichlet-masked 1D z matrices on the first Zr rows/cols, zero-embedded
    into [Z, Z] (Z > Zr = lane padding; the zero region makes padded lanes
    inert in the banded contraction and the z matmuls alike)."""
    Kzm = np.zeros((Z, Z))
    Mzm = np.zeros((Z, Z))
    Kzm[:Zr, :Zr] = (m1[:, None] * K1 * m1[None, :])[:Zr, :Zr]
    Mzm[:Zr, :Zr] = (m1[:, None] * M1 * m1[None, :])[:Zr, :Zr]
    return Kzm, Mzm


def make_pallas_laplace(
    space: FESpace,
    dtype=jnp.float32,
    bx: int = 8,
    by: int = 8,
    interpret: bool = False,
    core: str = "banded",
    zpad: int | None = None,
) -> PallasLaplaceOperator:
    """``zpad=None`` (default) pads z lanes per :func:`lane_pad`; an explicit
    value overrides it (interpret-mode tests exercise padding on tiny
    grids this way)."""
    if not (interpret or pallas_eligible(space, bx, by, zpad)):
        raise ValueError(
            "pallas operator requires dim==3, padded lanes n*p + zpad a "
            "128-multiple >= 128 and 8-aligned block windows; use "
            "make_laplace_auto for fallback"
        )
    if core not in ("banded", "mxu", "mxu3", "hyb3"):
        raise ValueError(f"unknown pallas core: {core!r}")
    p = space.degree
    n = space.mesh.cells_per_axis
    if zpad is None:
        zpad = lane_pad(space)
    if zpad and zpad < p:
        # banded rolls may wrap at most p lanes across the pad boundary;
        # a pad thinner than p would alias real data (cannot happen for
        # power-of-two cell counts, but guard explicit overrides)
        raise ValueError(f"zpad {zpad} must be 0 or >= degree {p}")
    X, Y, Z = bx * p + 1, by * p + 1, n * p + zpad
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

    Kzm, Mzm = _masked_z_matrices(K1, M1, m1, n * p, Z)
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
    dense_mats = _dense_mats_for_core(
        core, Kzm, Mzm, Kxl, Mxl, Kyl, Myl, X, p, dtype
    )
    gK, gM = diagonal_1d_factors(space)
    return PallasLaplaceOperator(
        dim=space.dim,
        degree=p,
        n=(n,) * space.dim,
        bx=bx,
        by=by,
        interpret=interpret,
        core=core,
        zpad=zpad,
        bands=tuple(jnp.asarray(v, dtype) for v in bands) if core == "banded"
        else None,
        dense_mats=dense_mats,
        mask1=(jnp.asarray(space.free_mask_1d(), dtype),) * space.dim,
        dK1=(jnp.asarray(gK, dtype),) * space.dim,
        dM1=(jnp.asarray(gM, dtype),) * space.dim,
    )


def _dense_mats_for_core(core, Kzm, Mzm, Kxl, Mxl, Kyl, Myl, X, p, dtype):
    """Matrix operand pack per compute core (see PallasLaplaceOperator)."""
    if core == "banded":
        return None
    bf = jnp.bfloat16
    KyB = np.broadcast_to(Kyl, (X,) + Kyl.shape)
    MyB = np.broadcast_to(Myl, (X,) + Myl.shape)

    def hilo(mats):
        his = tuple(jnp.asarray(w, bf) for w in mats)
        los = tuple(
            jnp.asarray(
                np.asarray(w, np.float32) - np.asarray(h, np.float32), bf
            )
            for w, h in zip(mats, his)
        )
        return his, los

    if core == "mxu":
        his, _ = hilo((Kzm, Mzm, Kxl, Mxl, KyB, MyB))
        return his
    if core == "mxu3":
        his, los = hilo((Kzm, Mzm, Kxl, Mxl, KyB, MyB))
        return his + los
    # hyb3: exact banded z (f32 band arrays) + hi/lo dense x/y
    nb = 2 * p + 1
    Z = Kzm.shape[0]
    his, los = hilo((Kxl, Mxl, KyB, MyB))
    return (
        jnp.asarray(to_bands(Kzm, p).reshape(nb, 1, 1, Z), dtype),
        jnp.asarray(to_bands(Mzm, p).reshape(nb, 1, 1, Z), dtype),
    ) + his + los


def make_resid3_twin(space: FESpace, op, dtype=jnp.float32):
    """Smaller-block banded twin for the residual3t kernel.

    Mosaic cannot compile the banded core with 3 blocked outputs at 16x16
    blocks / >=256 lanes (r3 batch-2 bisection); apply/residual1t stay on
    the 16x16 operator and smooth() routes its residual half-step through
    this twin.  Returns None when ``op`` needs no twin."""
    if not isinstance(op, PallasLaplaceOperator) or op.core != "banded":
        return None
    if (op.bx, op.by) != (16, 16):
        return None  # smaller blocks compile residual3t fine
    if space.mesh.cells_per_axis * space.degree + op.zpad < 256:
        return None  # 16x16 residual3t compiles below 256 lanes (entry r=5)
    if pallas_eligible(space, 8, 8):
        return make_pallas_laplace(space, dtype, bx=8, by=8, core="banded")
    return None


def slab_pallas_eligible(
    space: FESpace, n_loc: int, bx: int = 8, by: int = 8,
    zpad: int | None = None,
) -> bool:
    """``zpad=None`` uses the :func:`lane_pad` policy (lane-exact grids plus
    128-multiple padding); an explicit value admits any grid whose padded
    lane extent n*p + zpad is a 128-multiple >= 128 — the z axis is NOT the
    sharded axis, so lane padding composes with slab sharding unchanged."""
    n, p = space.mesh.cells_per_axis, space.degree
    if zpad is None:
        lanes_ok = n * p >= 128
    else:
        Z = n * p + zpad
        lanes_ok = Z >= 128 and Z % 128 == 0 and (zpad == 0 or zpad >= p)
    return (
        space.dim == 3
        and lanes_ok
        and n_loc % bx == 0
        and n % by == 0
        and (bx * p) % 8 == 0
        and (by * p) % 8 == 0
    )


def make_pallas_slab(
    space: FESpace,
    n_loc: int,
    dtype=jnp.float32,
    bx: int = 8,
    by: int = 8,
    core: str = "banded",
    interpret: bool = False,
    zpad: int | None = None,
) -> PallasLaplaceOperator:
    """Slab operator for shard_map: n_loc cells along sharded axis 0, full
    y/z extents.  x-masking runs in "vector" mode so interior shard
    boundaries stay unmasked and the kernel emits raw partial planes for
    halo accumulation; the caller must replace mask1[0]/dK1[0]/dM1[0] with
    the per-shard slices of the global factors (parallel/poisson.py does).

    The kernel itself is partition-agnostic, mirroring the reference's one
    hot kernel for serial and MPI runs (reference:
    include/operators/portable_laplace_operator.h:557-719)."""
    if not (interpret or slab_pallas_eligible(space, n_loc, bx, by, zpad)):
        raise ValueError("slab not eligible for the pallas kernel")
    p = space.degree
    n = space.mesh.cells_per_axis
    if zpad is None:
        zpad = lane_pad(space)
    X, Y, Z = bx * p + 1, by * p + 1, n * p + zpad
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

    Kzm, Mzm = _masked_z_matrices(K1, M1, m1, n * p, Z)
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
    dense_mats = _dense_mats_for_core(
        core, Kzm, Mzm, Kxl, Mxl, Kyl, Myl, X, p, dtype
    )
    gK, gM = diagonal_1d_factors(space)
    m1j = jnp.asarray(m1, dtype)
    gKj, gMj = jnp.asarray(gK, dtype), jnp.asarray(gM, dtype)
    # axis-0 entries are the GLOBAL factors; the stacked builder partitions
    # them into per-shard slices of length n_loc*p + 1
    return PallasLaplaceOperator(
        dim=space.dim,
        degree=p,
        n=(n_loc, n, n),
        bx=bx,
        by=by,
        interpret=interpret,
        core=core,
        xmask="vector",
        zpad=zpad,
        bands=tuple(jnp.asarray(v, dtype) for v in bands)
        if core == "banded" else None,
        dense_mats=dense_mats,
        mask1=(m1j, m1j, m1j),
        dK1=(gKj, gKj, gKj),
        dM1=(gMj, gMj, gMj),
    )


def make_pallas_slab2d(
    space: FESpace,
    n_loc_x: int,
    n_loc_y: int,
    dtype=jnp.float32,
    bx: int = 8,
    by: int = 8,
    core: str = "banded",
    interpret: bool = False,
    zpad: int | None = None,
) -> PallasLaplaceOperator:
    """Pencil slab operator for 2D device meshes: n_loc_x x n_loc_y cells,
    full z.  BOTH x and y masking run in "vector" mode (per-shard mask
    slices keep interior pencil boundaries unmasked); x/y block matrices are
    PARTIAL local assemblies, so the kernel emits raw partial boundary
    planes on both sharded axes for the 2D halo exchange
    (parallel/mesh2d.py:ShardedPallas2DLaplace).  The caller replaces
    mask1/dK1/dM1 axis-0 AND axis-1 entries with per-shard slices.
    ``zpad`` lane-pads the (unsharded) z axis exactly as in
    :func:`make_pallas_slab`."""
    p = space.degree
    n = space.mesh.cells_per_axis
    if zpad is None:
        zpad = lane_pad(space)
    Zk = n * p + zpad
    eligible = (
        space.dim == 3
        and Zk >= 128 and Zk % 128 == 0 and (zpad == 0 or zpad >= p)
        and n_loc_x % bx == 0
        and n_loc_y % by == 0
        and (bx * p) % 8 == 0
        and (by * p) % 8 == 0
    )
    if not (interpret or eligible):
        raise ValueError("pencil slab not eligible for the pallas kernel")
    X, Y, Z = bx * p + 1, by * p + 1, Zk
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

    Kzm, Mzm = _masked_z_matrices(K1, M1, m1, n * p, Z)
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
    dense_mats = _dense_mats_for_core(
        core, Kzm, Mzm, Kxl, Mxl, Kyl, Myl, X, p, dtype
    )
    gK, gM = diagonal_1d_factors(space)
    m1j = jnp.asarray(m1, dtype)
    gKj, gMj = jnp.asarray(gK, dtype), jnp.asarray(gM, dtype)
    return PallasLaplaceOperator(
        dim=space.dim,
        degree=p,
        n=(n_loc_x, n_loc_y, n),
        bx=bx,
        by=by,
        interpret=interpret,
        core=core,
        xmask="vector",
        ymask="vector",
        zpad=zpad,
        bands=tuple(jnp.asarray(v, dtype) for v in bands)
        if core == "banded" else None,
        dense_mats=dense_mats,
        mask1=(m1j, m1j, m1j),
        dK1=(gKj, gKj, gKj),
        dM1=(gMj, gMj, gMj),
    )


# Degrees whose BANDED kernel crashes the Mosaic compiler at any block size
# (p=6: r3 batch-14b/17 bisects — Q5 zpad-384 and Q7 banded compile at the
# same lane counts, so the crash is degree-specific, not lane-count).  The
# bf16 mxu core compiles at p=6, so only the exact/banded role is affected.
_BANDED_CRASH_DEGREES = frozenset({6})

# process-level memo of AOT compile-probe outcomes (see cheb2's twin in
# ops/pallas_cheb2.py): repeated level builds must not re-pay the probe
_LAPLACE_OK_MEMO: dict = {}

# the exact-role operator serves CG applies plus the trimmed pipeline's
# residual kernels; the fused smoother role runs the recurrence modes
_EXACT_MODES = ("apply", "residual1t", "residual3t")
_SMOOTH_MODES = ("cheb", "chebl")


def laplace_compile_ok(op: "PallasLaplaceOperator",
                       modes: tuple = _EXACT_MODES,
                       sdtype: str = "bf16") -> bool:
    """AOT-compile the operator's kernel modes on the current backend;
    False when the Mosaic compile crashes (empirical envelope, CLAUDE.md
    round-3 rules).  All modes compile in ONE jitted program (one
    remote-compile round trip); nothing executes."""
    if op.interpret:
        return True  # interpret mode never reaches Mosaic — skip the memos
    key = (op.n, op.degree, op.bx, op.by, op.core, op.zpad, op.xmask,
           op.ymask, sdtype, tuple(modes))
    if key not in _LAPLACE_OK_MEMO:
        from ..utils import probe_cache

        hit = probe_cache.get("laplace_ok", key)
        if hit is None:
            hit = _laplace_compile_probe(op, modes, sdtype)
            probe_cache.put("laplace_ok", key, hit)
        _LAPLACE_OK_MEMO[key] = hit
    return _LAPLACE_OK_MEMO[key]


def _laplace_compile_probe(op, modes, sdtype) -> bool:
    if op.interpret:
        return True
    p = op.degree
    n0, n1, n2 = op.n
    tshape = (n0 * p, n1 * p, n2 * p + op.zpad)  # trimmed state
    f32 = jnp.float32
    sd = jnp.bfloat16 if sdtype == "bf16" else f32
    scal2 = np.asarray([1.1, 0.7], np.float32)

    def prog(uf, ut, rt, dsd, rsd, xt):
        acc = jnp.zeros((), f32)
        for mode in modes:
            if mode == "apply":
                outs = (op.apply(uf),)
            elif mode == "residual1t":
                outs = op._run("residual1t", ut, (rt,))
            elif mode == "residual3t":
                outs = op._run("residual3t", ut, (rt,), scal2,
                               sdtype=sdtype)
            elif mode in ("chebd", "chebdl"):
                outs = op._run(mode, dsd, (rsd,), scal2, sdtype=sdtype)
            else:  # "cheb" / "chebl"
                outs = op._run(mode, dsd, (rsd, xt), scal2, sdtype=sdtype)
            outs = outs if isinstance(outs, tuple) else (outs,)
            acc = acc + sum(o.ravel()[0].astype(f32) for o in outs)
        return acc

    args = (
        jax.ShapeDtypeStruct(op.grid_shape, f32),
        jax.ShapeDtypeStruct(tshape, f32),
        jax.ShapeDtypeStruct(tshape, f32),
        jax.ShapeDtypeStruct(tshape, sd),
        jax.ShapeDtypeStruct(tshape, sd),
        jax.ShapeDtypeStruct(tshape, f32),
    )
    try:
        jax.jit(prog).lower(*args).compile()
        return True
    except Exception as e:  # noqa: BLE001 — Mosaic crashes surface here
        import sys

        print(
            f"pallas compile probe failed: core={op.core} block="
            f"{op.bx}x{op.by} n={op.n} p={p} zpad={op.zpad} modes={modes}: "
            f"{type(e).__name__}; degrading", file=sys.stderr,
        )
        return False


def _exact_rescue(space: FESpace, dtype, precision: str):
    """Exact-role operator for banded-crash-listed degrees (VERDICT r3
    item 5 — the Q6 hole): the f32-faithful hi/lo "mxu3" core compiles
    where the banded core crashes, and it is exact-role-grade (matches the
    assembled operator to f32 roundoff, tests/test_pallas_smoother.py
    ::test_mxu3_core_is_f32_faithful; CG-count parity pinned by
    tests/test_laplace_auto.py).  Every candidate is compile-probed — the
    p=6 envelope is otherwise unmapped — and None means "fall back to
    kron" (which also disables the fused smoother gating in models/bench).
    """
    if jax.default_backend() == "cpu":
        return None  # Mosaic probes need a TPU backend
    lanes = space.mesh.cells_per_axis * space.degree + lane_pad(space)
    cands = ((16, 16), (8, 8)) if lanes <= 256 else ((16, 8), (8, 8))
    for bx, by in cands:
        if not pallas_eligible(space, bx, by):
            continue
        op = make_pallas_laplace(space, dtype, bx=bx, by=by, core="mxu3")
        if laplace_compile_ok(op, modes=_EXACT_MODES):
            return op
    return None


def make_laplace_auto(
    space: FESpace, dtype=jnp.float32, precision="high", core: str = "banded"
):
    """Fastest eligible operator: fused Pallas kernel where it applies,
    assembled-Kronecker XLA path otherwise.

    ``core`` selects the kernel engine for eligible grids: "banded" (exact
    f32, the CG/residual operator), "mxu" (bf16 smoother-grade — use ONLY
    inside Chebyshev recurrences, where it provably preserves convergence
    counts, tests/test_pallas_smoother.py), "mxu3" (f32-faithful hi/lo MXU).

    Block-size choice: with in-kernel double-buffered input DMA, 16x16
    blocks win both isolated and composed benchmarks (mxu core: 0.51 ms vs
    1.26 ms at 8x8 on r=6 Q4); 8x8 remains the fallback for small grids.
    Above 256 lanes 16x16 crashes the Mosaic compiler (round-2 finding);
    round-3 measurements: the asymmetric 16x8 block compiles there and wins
    for the MXU family (r=7 mxu apply 7.27 ms vs 7.9) while the banded
    core is fastest at 8x8 (11.7 vs 12.6 at 16x8), so the candidate list is
    core-dependent.

    dim == 2 spaces dispatch to the 2D fused family (ops/pallas_laplace2d)
    — one banded operator serves every role there, so ``core`` requests for
    an MXU smoother twin return the same banded kernel."""
    if space.dim == 2:
        from .pallas_laplace2d import make_laplace2d_candidate

        op = make_laplace2d_candidate(space, dtype)
        if op is not None:
            return op
        return make_laplace(space, dtype, variant=best_xla_variant(space),
                            precision=precision)
    if core == "banded" and space.degree in _BANDED_CRASH_DEGREES:
        # the exact role cannot run the banded kernel at this degree — try
        # the compile-probed mxu3 (f32-faithful) rescue, then fall through
        # to the assembled-Kronecker XLA path.  PMG_NO_MXU3_EXACT=1 forces
        # the old kron behavior (deployment escape hatch).
        import os

        if (dtype == jnp.float32
                and os.environ.get("PMG_NO_MXU3_EXACT", "0") != "1"):
            op = _exact_rescue(space, dtype, precision)
            if op is not None:
                return op
        return make_laplace(space, dtype, variant=best_xla_variant(space),
                            precision=precision)
    if dtype == jnp.float32:
        # the Mosaic block-size crash rules key on the KERNEL lane extent,
        # i.e. the padded count (Q7 r=5: 224 real lanes pad to 256)
        lanes = space.mesh.cells_per_axis * space.degree + lane_pad(space)
        if lanes <= 256:
            cands = ((16, 16), (8, 8))
        elif core == "banded":
            cands = ((8, 8),)
        else:
            cands = ((16, 8), (8, 8))
        n_cells = space.mesh.cells_per_axis
        if n_cells < 8:
            # zpad-up coarse levels (PMG_ZPAD_UP): whole-grid block on
            # meshes smaller than the standard block edges
            cands = cands + ((n_cells, n_cells),)
        for bx, by in cands:
            if pallas_eligible(space, bx, by):
                X, Y = bx * space.degree + 1, by * space.degree + 1
                Z = lanes
                nbj = space.mesh.cells_per_axis // by
                est = 4 * (
                    2 * X * (Y + 7) * Z  # input slabs
                    + 2 * (X - 1) * (Y - 1) * Z  # output slabs
                    + 2 * nbj * Y * Z  # x-carry planes
                    + 6 * X * Y * Z  # live intermediates
                    # fused "cheb" mode adds 2 pipeline-blocked inputs +
                    # 3 blocked outputs, each double-buffered by the Pallas
                    # pipeline — eligibility must cover the operator's use
                    # as a FusedChebyshev op_smooth, not just mode "apply"
                    + 5 * 2 * (X - 1) * (Y - 1) * Z
                )
                if est < 110 * 1024 * 1024:
                    op = make_pallas_laplace(
                        space, dtype, bx=bx, by=by, core=core
                    )
                    # EVERY candidate is AOT compile-probed (memoized) on a
                    # real backend before being returned: the declared-VMEM
                    # estimate above cannot see register-allocator spills —
                    # the 2026 toolchain OOM'd the p=7 banded 8x8 kernel
                    # with 106.7M of SPILL SLOTS (q7_r5 batch-1 capture)
                    # after round 3 had it compiling, so the crash envelope
                    # is toolchain-dependent and must be probed, not listed.
                    if (jax.default_backend() != "cpu"
                            and not laplace_compile_ok(
                                op,
                                modes=(_SMOOTH_MODES if core != "banded"
                                       else _EXACT_MODES))):
                        continue
                    return op
        if core == "banded":
            # no banded candidate compiles: the compile-probed mxu3
            # (f32-faithful) rescue, exactly as for the crash-listed degrees
            import os

            if os.environ.get("PMG_NO_MXU3_EXACT", "0") != "1":
                op = _exact_rescue(space, dtype, precision)
                if op is not None:
                    return op
    return make_laplace(space, dtype, variant=best_xla_variant(space),
                        precision=precision)
