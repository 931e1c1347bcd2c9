"""Fused Pallas TPU kernel for the vector-valued elasticity operator.

The elasticity weak form a(u, v) = ∫ 2 mu eps(u):eps(v) + lam (div u)(div v)
factorizes EXACTLY over the tensor-product mesh into 21 banded Kronecker
chains (the "kron" variant, ops/elasticity.py:apply_kron — the TPU-shaped
reformulation of the reference's per-cell q-point gradient-tensor loop,
reference: include/operators/portable_laplace_operator.h:300-325):

  out_c = sum_a alpha_{a,c} (K@a, M else) u_c                (diagonal block)
        + sum_{a != c} mu (G@a, GT@c, M@third) u_a
                     + lam (G@c, GT@a, M@third) u_a          (coupling)

with alpha_{c,c} = 2 mu + lam, alpha otherwise mu, and G the assembled 1D
gradient matrix G[i,j] = ∫ l_i' l_j dx (GT its transpose).  K, M, G, GT are
all (2p+1)-banded, so the whole vector apply runs as banded roll+FMA chains
on the VPU — exact f32, one HBM read + one write per component — instead of
kron's 21 full-grid XLA tensordot chains (measured 9.9 ms at Q3 r=6; the
element-local dense/sumfac variants lose to XLA layout shuffles, see
PERFORMANCE.md round-4 shoot-out).

Structure is the vector twin of the scalar banded kernel
(ops/pallas_laplace.py): x/y block grid with PARTIAL block-local 1D
assemblies, inter-block overlap-add resolved by per-component carry planes,
double-buffered input DMA, mask semantics A_eff = M A M + (I - M) with the
z-mask folded into the (zero-embedded, lane-padded) z matrices.

Roll sharing: each stage rolls its input tensor once per offset and applies
every band set that consumes it (z: 4 sets per component; y: up to 4;
x: grouped per output by x-matrix) — 27 roll sets total vs the scalar
kernel's 4, for 3x the data: ~2.2x the scalar per-DoF VPU work.
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
from .elasticity import assembled_1d_gradient, make_elasticity
from .laplace import assembled_1d_matrices, diagonal_1d_factors
from .pallas_laplace import (
    _BANDED_CRASH_DEGREES,
    lane_pad,
    pallas_eligible,
    to_bands,
)


@pytree_dataclass
class PallasElasticityOperator:
    """Banded vector-valued elasticity apply (exact f32, dim == 3 only)."""

    dim: int = static_field()
    degree: int = static_field()
    n: tuple = static_field()
    bx: int = static_field()
    by: int = static_field()
    interpret: bool = static_field(default=False)
    zpad: int = static_field(default=0)
    mu: float = static_field(default=1.0)
    lam: float = static_field(default=1.0)
    variant: str = static_field(default="pallas")  # bench/model introspection
    # "banded" = exact f32 roll+FMA on the VPU (CG/residual role); "mxu" =
    # bf16 dense matmuls on the systolic array (smoother-recurrence role:
    # the scalar-operator lesson — Chebyshev recurrences tolerate a
    # bf16-grade operator, tests/test_pallas_smoother.py — carries over,
    # pinned for elasticity by the solve-count check in
    # tests/test_pallas_elasticity.py)
    core: str = static_field(default="banded")
    # "iota" = structural x boundary mask (single-chip grids: the global
    # first/last x planes are Dirichlet); "vector" = mask1[0] rides as a
    # kernel operand so interior SHARD boundaries stay unmasked and the
    # kernel emits raw partial planes for halo accumulation (the scalar
    # slab kernel's mode — ops/pallas_laplace.py:make_pallas_slab)
    xmask: str = static_field(default="iota")
    # 12 band arrays: (Kz, Mz, Gz, Hz, Kx, Mx, Gx, Hx, Ky, My, Gy, Hy)
    # (H = G transpose); z global mask-folded + zero-embedded to the padded
    # lane extent, x/y PARTIAL block-local assemblies (carry-completed)
    bands: tuple = None
    # "mxu" core: 12 dense bf16 matrices in the SAME slot order; z entries
    # host-transposed (the dz contraction applies W^T), y entries broadcast
    # to (X, Y, Y) for the batched dy pattern
    dense_mats: tuple = None
    mask1: tuple = None  # per-axis [N_d] separable Dirichlet mask
    dK1: tuple = None  # per-axis 1D diagonal factors (scalar-operator twins)
    dM1: tuple = None

    @property
    def grid_shape(self):
        return tuple(nd * self.degree + 1 for nd in self.n)

    @property
    def shape(self):
        return (self.dim,) + self.grid_shape

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
        """[dim, grid]: only the diagonal blocks sum_a alpha_{a,c} K-chain
        contribute to the matrix diagonal (coupling chains live in
        off-diagonal component blocks), so the elasticity diagonal is the
        alpha-weighted scalar separable closed form — O(N) factors, no
        assembled 3D diagonal in the pytree (cross-checked against the
        assembled element-matrix diagonal in tests/test_pallas_elasticity)."""
        mu, lam = self.mu, self.lam
        m = self.mask
        outs = []
        for c in range(self.dim):
            diag = None
            for k in range(self.dim):
                term = self._bc(self.dK1[0] if k == 0 else self.dM1[0], 0)
                for d in range(1, self.dim):
                    term = term * self._bc(
                        self.dK1[d] if d == k else self.dM1[d], d
                    )
                alpha = 2.0 * mu + lam if k == c else mu
                term = alpha * term
                diag = term if diag is None else diag + term
            outs.append(1.0 / (diag * m + (1.0 - m)))
        return jnp.stack(outs)

    @property
    def n_dofs(self):
        out = self.dim
        for s in self.grid_shape:
            out *= s
        return out

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        u = u.reshape(self.shape)
        uk = u
        if self.zpad:
            uk = jnp.pad(u, ((0, 0), (0, 0), (0, 0), (0, self.zpad - 1)))
        outs = self._run("apply", uk)
        au = jnp.stack(outs)
        if self.zpad:
            au = au[..., : self.grid_shape[2] - 1]
        au = jnp.pad(au, ((0, 0), (0, 1), (0, 1), (0, 1)))
        m = self.mask[None]
        return m * au + (1.0 - m) * u

    vmult = apply

    def _run(self, mode: str, u, blocked_ins=(), scal=None):
        """Shared block-grid / carry-plane kernel skeleton, vector twin of
        the scalar fused-mode family (ops/pallas_laplace.py:_run):

        * "apply":     outv_c = (M A M u)_c trimmed; u stacked full grid.
        * "residual":  r0_c = rhs_c - (M A M u)_c, d0_c = r0_c/(theta
                       diag_c); u stacked full, blocked_ins = 3 trimmed rhs
                       components, scal = [theta, theta]; 6 outputs.
        * "residual1": r0_c only (restriction prep); 3 outputs, no facs.
        * "cheb":      one fused Chebyshev recurrence step on TRIMMED
                       3-component state: r'_c = r_c - (M A M d)_c,
                       d'_c = c0 d_c + c1 r'_c/diag_c, x'_c = x_c + d'_c;
                       u = (d0, d1, d2) tuple of trimmed components (three
                       ANY stencil operands), blocked_ins = (r0..r2,
                       x0..x2), scal = [c0, c1]; 9 outputs.
        * "chebl":     LAST step — only x'_c written (3 outputs).

        diag_c is rebuilt in-VMEM from the scalar per-axis 1D factors with
        the elasticity alpha weights (diag_c = sum_k alpha_{k,c} term_k,
        alpha = 2mu+lam on the component's own axis, mu otherwise) — the
        vector analog of the scalar kernel's separable-diagonal rebuild.
        The fused modes kill the 3-component elementwise XLA passes between
        smoother kernel launches (VERDICT r4 item 5)."""
        p = self.degree
        n0, n1, n2 = self.n
        N0, N1 = n0 * p + 1, n1 * p + 1
        bx, by = self.bx, self.by
        X, Y, Z = bx * p + 1, by * p + 1, n2 * p + self.zpad
        nbi, nbj = n0 // bx, n1 // by
        byp, bxp = by * p, bx * p
        dtype = self.dtype
        mu, lam = self.mu, self.lam
        al = 2.0 * mu + lam
        trimmed_in = mode in ("cheb", "chebl")
        xmask_vec = self.xmask == "vector"
        n_xm = 1 if xmask_vec else 0
        n_facs = 6 if mode in ("residual", "cheb", "chebl") else 0
        n_scal = 0 if scal is None else 1
        n_bins = len(blocked_ins)
        n_outs = {"apply": 3, "residual1": 3, "residual": 6,
                  "cheb": 9, "chebl": 3}[mode]

        if byp % 8 != 0:
            raise ValueError("pallas kernel requires by*p % 8 == 0")

        def kernel(*args):
            if trimmed_in:
                u_refs = args[:3]
                refs = args[3:]
            else:
                u_refs = (args[0],) * 3  # stacked: component picked in .at[]
                refs = args[1:]
            (Kz_r, Mz_r, Gz_r, Hz_r, Kx_r, Mx_r, Gx_r, Hx_r,
             Ky_r, My_r, Gy_r, Hy_r) = refs[:12]
            pos = 12
            xm_r = refs[pos] if xmask_vec else None
            pos += n_xm
            fac_refs = refs[pos: pos + n_facs]
            pos += n_facs
            scal_r = refs[pos] if n_scal else None
            pos += n_scal
            bin_refs = refs[pos: pos + n_bins]
            pos += n_bins
            out_refs = refs[pos: pos + n_outs]
            pos += n_outs
            slabs = refs[pos: pos + 3]
            cys = refs[pos + 3: pos + 6]
            cxs = refs[pos + 6: pos + 9]
            sems = refs[pos + 9]
            i = pl.program_id(0)
            j = pl.program_id(1)
            k = i * nbj + j
            islot = jax.lax.rem(k, jnp.int32(2))

            # double-buffered input DMA, one slab per component (the scalar
            # kernel's skeleton; y-window = aligned byp body + next 8 rows).
            # Trimmed stencil inputs (cheb modes) lack the global last
            # x-plane: the last i-block fetches rows-1 rows and zeroes the
            # window's final row (scalar on_rows precedent).
            def in_main(c, slot, ii, jj, rows):
                if trimmed_in:
                    src = u_refs[c].at[pl.ds(ii * bxp, rows),
                                       pl.ds(jj * byp, byp), pl.ds(0, Z)]
                else:
                    src = u_refs[c].at[c, pl.ds(ii * bxp, rows),
                                       pl.ds(jj * byp, byp), pl.ds(0, Z)]
                return pltpu.make_async_copy(
                    src, slabs[c].at[slot, 0:rows, 0:byp, :],
                    sems.at[4 * c + slot],
                )

            def in_tail(c, slot, ii, jj, rows):
                if trimmed_in:
                    src = u_refs[c].at[pl.ds(ii * bxp, rows),
                                       pl.ds((jj + 1) * byp, 8), pl.ds(0, Z)]
                else:
                    src = u_refs[c].at[c, pl.ds(ii * bxp, rows),
                                       pl.ds((jj + 1) * byp, 8), pl.ds(0, Z)]
                return pltpu.make_async_copy(
                    src, slabs[c].at[slot, 0:rows, byp: byp + 8, :],
                    sems.at[4 * c + 2 + slot],
                )

            def on_rows(ii, fn):
                """Static row count for block-row ii (trimmed stencil
                inputs are one x-row short on the last block)."""
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
                for c in range(3):
                    on_rows(ii,
                            lambda rows, c=c:
                            in_main(c, slot, ii, jj, rows).start())
                    if trimmed_in:

                        @pl.when(ii == nbi - 1)
                        def _(c=c):
                            slabs[c][slot, X - 1: X, :, :] = jnp.zeros(
                                (1, byp + 8, Z), dtype
                            )

                    @pl.when(jj < nbj - 1)
                    def _(c=c):
                        on_rows(ii,
                                lambda rows, c=c:
                                in_tail(c, slot, ii, jj, rows).start())

                    @pl.when(jj == nbj - 1)
                    def _(c=c):
                        slabs[c][slot, :, byp: byp + 8, :] = jnp.zeros(
                            (X, 8, Z), dtype
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

            for c in range(3):
                on_rows(i,
                        lambda rows, c=c: in_main(c, islot, i, j,
                                                  rows).wait())

                @pl.when(j < nbj - 1)
                def _(c=c):
                    on_rows(i,
                            lambda rows, c=c: in_tail(c, islot, i, j,
                                                      rows).wait())

            yi = jax.lax.broadcasted_iota(jnp.int32, (1, Y, 1), 1)
            if xmask_vec:
                mvx = xm_r[pl.ds(i * bxp, X), :, :]
            else:
                xi = jax.lax.broadcasted_iota(jnp.int32, (X, 1, 1), 0)
                mvx = jnp.logical_and(
                    jnp.logical_or(i > 0, xi > 0),
                    jnp.logical_or(i < nbi - 1, xi < X - 1),
                ).astype(dtype)
            mvy = jnp.logical_and(
                jnp.logical_or(j > 0, yi > 0),
                jnp.logical_or(j < nbj - 1, yi < Y - 1),
            ).astype(dtype)

            um = [slabs[c][islot, :, :Y, :] * mvx * mvy for c in range(3)]

            def banded_multi(t, band_refs, axis):
                """Shared rolls of ``t``, one accumulator per band set."""
                L = t.shape[axis]
                accs = [br[p] * t for br in band_refs]
                for o in range(1, p + 1):
                    tl = pltpu.roll(t, L - o, axis=axis)
                    tr = pltpu.roll(t, o, axis=axis)
                    for ix, br in enumerate(band_refs):
                        accs[ix] += br[p + o] * tl + br[p - o] * tr
                return accs

            def banded(t, br, axis):
                return banded_multi(t, (br,), axis)[0]

            if self.core == "banded":
                # ---- z stage: 4 banded products per comp, shared rolls
                b0, k0, g0, h0 = banded_multi(
                    um[0], (Mz_r, Kz_r, Gz_r, Hz_r), 2
                )
                b1, k1, g1, h1 = banded_multi(
                    um[1], (Mz_r, Kz_r, Gz_r, Hz_r), 2
                )
                b2, k2, g2, h2 = banded_multi(
                    um[2], (Mz_r, Kz_r, Gz_r, Hz_r), 2
                )
            else:
                # ---- "mxu" core: every 1D contraction a dense bf16 matmul
                # with f32 accumulation (the scalar mxu core's dz/dy/dx
                # patterns — Mosaic-safe: no transposes, bf16 inputs).
                # Interpret mode upcasts the bf16-ROUNDED values to f32
                # (identical products; "DotThunk" CPU limitation).
                bf = jnp.bfloat16
                f32 = jnp.float32
                up = ((lambda v: v.astype(f32)) if self.interpret
                      else (lambda v: v))

                def dz(t, w_r):
                    return jax.lax.dot_general(
                        up(t.astype(bf)), up(w_r[...]),
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=f32)

                def dy(t, w_r):
                    return jax.lax.dot_general(
                        up(w_r[...]), up(t.astype(bf)),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=f32)

                def dx(t, w_r):
                    return jax.lax.dot_general(
                        up(w_r[...]), up(t.astype(bf)),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32)

                def banded_multi(t, band_refs, axis):  # noqa: F811
                    d = {2: dz, 1: dy, 0: dx}[axis]
                    return [d(t, br) for br in band_refs]

                def banded(t, br, axis):  # noqa: F811
                    return banded_multi(t, (br,), axis)[0]

                b0, k0, g0, h0 = banded_multi(
                    um[0], (Mz_r, Kz_r, Gz_r, Hz_r), 2
                )
                b1, k1, g1, h1 = banded_multi(
                    um[1], (Mz_r, Kz_r, Gz_r, Hz_r), 2
                )
                b2, k2, g2, h2 = banded_multi(
                    um[2], (Mz_r, Kz_r, Gz_r, Hz_r), 2
                )

            # ---- y stage (naming: first letter = y matrix m/k/g/h applied,
            # rest = z-stage input)
            mb0, kb0, gb0, hb0 = banded_multi(
                b0, (My_r, Ky_r, Gy_r, Hy_r), 1
            )
            mb1, kb1, gb1, hb1 = banded_multi(
                b1, (My_r, Ky_r, Gy_r, Hy_r), 1
            )
            mb2, kb2 = banded_multi(b2, (My_r, Ky_r), 1)
            mk0 = banded(k0, My_r, 1)
            mk1 = banded(k1, My_r, 1)
            mk2 = banded(k2, My_r, 1)
            mg0 = banded(g0, My_r, 1)
            hg1 = banded(g1, Hy_r, 1)
            mg2, hg2 = banded_multi(g2, (My_r, Hy_r), 1)
            mh0 = banded(h0, My_r, 1)
            gh1 = banded(h1, Gy_r, 1)
            mh2, gh2 = banded_multi(h2, (My_r, Gy_r), 1)

            # ---- x stage: terms grouped per output by their x matrix, the
            # chain coefficients folded into the group sums
            raw0 = (
                banded(al * mb0, Kx_r, 0)
                + banded(mu * (kb0 + mk0), Mx_r, 0)
                + banded(mu * (gb1 + mg2), Hx_r, 0)
                + banded(lam * (hb1 + mh2), Gx_r, 0)
            )
            raw1 = (
                banded(mu * mb1, Kx_r, 0)
                + banded(al * kb1 + mu * (mk1 + hg2) + lam * gh2, Mx_r, 0)
                + banded(mu * hb0, Gx_r, 0)
                + banded(lam * gb0, Hx_r, 0)
            )
            raw2 = (
                banded(mu * mb2, Kx_r, 0)
                + banded(mu * (kb2 + gh1) + al * mk2 + lam * hg1, Mx_r, 0)
                + banded(mu * mh0, Gx_r, 0)
                + banded(lam * mg0, Hx_r, 0)
            )

            # ---- per-component carry-plane overlap-add (scalar logic x3)
            if n_facs:
                # in-VMEM separable diagonal rebuild, alpha-weighted per
                # component (the vector twin of the scalar fac_refs logic)
                (xK_r, xM_r, yK_r, yM_r, zK_r, zM_r) = fac_refs
                xK = xK_r[pl.ds(i * bxp, bxp), :, :]
                xM = xM_r[pl.ds(i * bxp, bxp), :, :]
                yK = yK_r[:, pl.ds(j * byp, byp), :]
                yM = yM_r[:, pl.ds(j * byp, byp), :]
                zK = zK_r[...]
                zM = zM_r[...]
                terms = (xK * yM * zM, xM * yK * zM, xM * yM * zK)
                diags = [
                    sum((al if kk == c else mu) * terms[kk]
                        for kk in range(3))
                    for c in range(3)
                ]
            wbuf = jax.lax.rem(i, jnp.int32(2))
            rbuf = 1 - wbuf
            for c, raw in enumerate((raw0, raw1, raw2)):
                raw = raw.astype(dtype)  # mxu core accumulates f32
                cxs[c][wbuf, j] = raw[X - 1]
                tmp_cy = raw[:, Y - 1, :]
                cy = jnp.where(
                    j > 0, cys[c][:, :], jnp.zeros_like(cys[c])
                )
                cys[c][:, :] = tmp_cy

                seg = cxs[c][rbuf, j]
                prev_last = cxs[c][rbuf, jnp.maximum(j - 1, 0)][Y - 1: Y, :]
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
                    out_refs[c][...] = outv
                elif mode == "residual1":
                    out_refs[c][...] = bin_refs[c][...] - outv
                elif mode == "residual":
                    theta = scal_r[0, 0]
                    r0 = bin_refs[c][...] - outv
                    out_refs[c][...] = r0
                    out_refs[3 + c][...] = r0 / (theta * diags[c])
                else:  # "cheb" / "chebl"
                    d_blk = slabs[c][islot, : X - 1, 0:byp, :].astype(dtype)
                    r_blk = bin_refs[c][...]
                    x_blk = bin_refs[3 + c][...]
                    c0 = scal_r[0, 0]
                    c1 = scal_r[0, 1]
                    rn = r_blk - outv
                    dn = c0 * d_blk + (c1 / diags[c]) * rn
                    if mode == "chebl":
                        out_refs[c][...] = x_blk + dn
                    else:
                        out_refs[c][...] = rn
                        out_refs[3 + c][...] = dn
                        out_refs[6 + c][...] = x_blk + dn

        n_stencil = 3 if trimmed_in else 1
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_stencil + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
        ] * 12
        mats = self.bands if self.core == "banded" else self.dense_mats
        operands = list(mats)
        if xmask_vec:
            operands.append(self.mask1[0].reshape(-1, 1, 1))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if n_facs:
            # trimmed per-axis diagonal factors; z pad lanes hold 1.0 (the
            # trimmed state is zero there and 0/diag needs finite nonzero)
            dKx, dKy, dKz = self.dK1
            dMx, dMy, dMz = self.dM1
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
        if n_scal:
            operands.append(jnp.asarray(scal, jnp.float32).reshape(1, 2))
            in_specs.append(
                pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        blk_spec = pl.BlockSpec((bxp, byp, Z), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        for b_in in blocked_ins:
            operands.append(b_in)
            in_specs.append(blk_spec)
        out_shape = tuple(
            jax.ShapeDtypeStruct((N0 - 1, N1 - 1, Z), dtype)
            for _ in range(n_outs)
        )
        scratch = (
            [pltpu.VMEM((2, X, byp + 8, Z), dtype) for _ in range(3)]
            + [pltpu.VMEM((X, Z), dtype) for _ in range(3)]
            + [pltpu.VMEM((2, nbj, Y, Z), dtype) for _ in range(3)]
            + [pltpu.SemaphoreType.DMA((12,))]
        )
        inner = pl.pallas_call(
            kernel,
            grid=(nbi, nbj),
            in_specs=in_specs,
            out_specs=(blk_spec,) * n_outs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )
        stencils = tuple(u) if trimmed_in else (u,)
        return inner(*stencils, *operands)


def _masked_embedded(W, m1, Zr, Z):
    out = np.zeros((Z, Z))
    out[:Zr, :Zr] = (m1[:, None] * W * m1[None, :])[:Zr, :Zr]
    return out


def make_pallas_elasticity(
    space: FESpace,
    dtype=jnp.float32,
    mu: float = 1.0,
    lam: float = 1.0,
    bx: int = 8,
    by: int = 8,
    interpret: bool = False,
    zpad: int | None = None,
    core: str = "banded",
) -> PallasElasticityOperator:
    if not (interpret or pallas_eligible(space, bx, by, zpad)):
        raise ValueError(
            "pallas elasticity requires dim==3, padded lanes a 128-multiple "
            ">= 128 and 8-aligned block windows; use make_elasticity_auto"
        )
    if space.dim != 3:
        raise ValueError("pallas elasticity kernel is 3D-only")
    if core not in ("banded", "mxu"):
        raise ValueError(f"unknown pallas elasticity core: {core!r}")
    p = space.degree
    n = space.mesh.cells_per_axis
    if zpad is None:
        zpad = lane_pad(space)
    if zpad and zpad < p:
        raise ValueError(f"zpad {zpad} must be 0 or >= degree {p}")
    X, Y, Z = bx * p + 1, by * p + 1, n * p + zpad
    nb = 2 * p + 1
    K1, M1 = assembled_1d_matrices(space)
    G1 = assembled_1d_gradient(space)
    m1 = space.free_mask_1d()

    b = make_basis(p)
    W = np.diag(b.q_weights)
    Kc = (b.D.T @ W @ b.D) / space.mesh.h
    Mc = (b.B.T @ W @ b.B) * space.mesh.h
    Gc = b.D.T @ W @ b.B  # h-free: derivative 1/h cancels dx h

    def local_1d(blk):
        w = blk * p + 1
        K = np.zeros((w, w))
        M = np.zeros((w, w))
        G = np.zeros((w, w))
        for c in range(blk):
            sl = slice(c * p, c * p + p + 1)
            K[sl, sl] += Kc
            M[sl, sl] += Mc
            G[sl, sl] += Gc
        return K, M, G

    Zr = n * p
    Kzm = _masked_embedded(K1, m1, Zr, Z)
    Mzm = _masked_embedded(M1, m1, Zr, Z)
    Gzm = _masked_embedded(G1, m1, Zr, Z)
    Kxl, Mxl, Gxl = local_1d(bx)
    Kyl, Myl, Gyl = local_1d(by)
    bands = (
        to_bands(Kzm, p).reshape(nb, 1, 1, Z),
        to_bands(Mzm, p).reshape(nb, 1, 1, Z),
        to_bands(Gzm, p).reshape(nb, 1, 1, Z),
        to_bands(Gzm.T, p).reshape(nb, 1, 1, Z),
        to_bands(Kxl, p).reshape(nb, X, 1, 1),
        to_bands(Mxl, p).reshape(nb, X, 1, 1),
        to_bands(Gxl, p).reshape(nb, X, 1, 1),
        to_bands(Gxl.T, p).reshape(nb, X, 1, 1),
        to_bands(Kyl, p).reshape(nb, 1, Y, 1),
        to_bands(Myl, p).reshape(nb, 1, Y, 1),
        to_bands(Gyl, p).reshape(nb, 1, Y, 1),
        to_bands(Gyl.T, p).reshape(nb, 1, Y, 1),
    )
    dense_mats = None
    if core == "mxu":
        bf = jnp.bfloat16
        bcast = lambda w: np.broadcast_to(w, (X,) + w.shape)  # noqa: E731
        dense_mats = tuple(
            jnp.asarray(w, bf)
            for w in (
                # z slots host-transposed: dz contracts t's lanes with the
                # matrix's FIRST axis, i.e. applies W^T (K/M symmetric; the
                # G/GT slots swap)
                Kzm.T, Mzm.T, Gzm.T, Gzm,
                Kxl, Mxl, Gxl, Gxl.T,
                bcast(Kyl), bcast(Myl), bcast(Gyl), bcast(Gyl.T),
            )
        )
    gK, gM = diagonal_1d_factors(space)
    return PallasElasticityOperator(
        dim=space.dim,
        degree=p,
        n=(n,) * space.dim,
        bx=bx,
        by=by,
        interpret=interpret,
        zpad=zpad,
        mu=float(mu),
        lam=float(lam),
        core=core,
        bands=(tuple(jnp.asarray(v, dtype) for v in bands)
               if core == "banded" else None),
        dense_mats=dense_mats,
        mask1=(jnp.asarray(m1, dtype),) * space.dim,
        dK1=(jnp.asarray(gK, dtype),) * space.dim,
        dM1=(jnp.asarray(gM, dtype),) * space.dim,
    )


def make_pallas_elasticity_slab(
    space: FESpace,
    n_loc: int,
    dtype=jnp.float32,
    mu: float = 1.0,
    lam: float = 1.0,
    bx: int = 8,
    by: int = 8,
    interpret: bool = False,
    zpad: int | None = None,
    core: str = "banded",
) -> PallasElasticityOperator:
    """Slab elasticity operator for shard_map: ``n_loc`` cells along sharded
    axis 0, full y/z extents, x-masking in "vector" mode (interior shard
    boundaries unmasked, raw partial planes out — the vector twin of
    ops/pallas_laplace.py:make_pallas_slab).  The caller must replace
    mask1[0]/dK1[0]/dM1[0] with the per-shard slices of the global factors
    (parallel/elasticity.py does)."""
    import dataclasses as _dc

    from .pallas_laplace import slab_pallas_eligible

    if not (interpret or slab_pallas_eligible(space, n_loc, bx, by, zpad)):
        raise ValueError("slab not eligible for the pallas elasticity kernel")
    base = make_pallas_elasticity(
        space, dtype, mu=mu, lam=lam, bx=bx, by=by, interpret=interpret,
        zpad=zpad, core=core,
    )
    n = space.mesh.cells_per_axis
    return _dc.replace(base, n=(n_loc, n, n), xmask="vector")


# AOT compile-probe memo (the Mosaic crash envelope is empirical and
# toolchain-dependent — every candidate is probed, mirroring
# ops/pallas_laplace.py:laplace_compile_ok)
_ELASTICITY_OK_MEMO: dict = {}


def elasticity_compile_ok(op: PallasElasticityOperator) -> bool:
    if op.interpret:
        return True  # interpret mode never reaches Mosaic — skip the memos
    key = (op.n, op.degree, op.bx, op.by, op.zpad, op.core, op.xmask)
    if key not in _ELASTICITY_OK_MEMO:
        from ..utils import probe_cache

        hit = probe_cache.get("elasticity_ok", key)
        if hit is None:
            hit = _probe(op)
            probe_cache.put("elasticity_ok", key, hit)
        _ELASTICITY_OK_MEMO[key] = hit
    return _ELASTICITY_OK_MEMO[key]


def _probe(op) -> bool:
    arg = jax.ShapeDtypeStruct(op.shape, jnp.float32)
    try:
        jax.jit(lambda u: op.apply(u).ravel()[0]).lower(arg).compile()
        return True
    except Exception as e:  # noqa: BLE001 — Mosaic crashes surface here
        import sys

        print(
            f"pallas elasticity compile probe failed: block={op.bx}x{op.by} "
            f"n={op.n} p={op.degree} zpad={op.zpad}: {type(e).__name__}: "
            f"{str(e).splitlines()[0][:200] if str(e) else ''}; degrading",
            file=sys.stderr,
        )
        return False


def elasticity_fused_ok(op: PallasElasticityOperator) -> bool:
    """AOT compile-probe the FUSED smoother modes (cheb: 3 trimmed stencil
    operands + 6 blocked inputs + 9 blocked outputs; residual: stacked
    input + 6 outputs) — a strictly larger Mosaic envelope than apply's
    (the scalar residual3t precedent: 3 blocked outputs crashed blocks that
    apply compiled).  Memoized on disk like elasticity_compile_ok."""
    if op.interpret:
        return True
    key = (op.n, op.degree, op.bx, op.by, op.zpad, op.core, op.xmask)
    memo_key = ("fused",) + key
    if memo_key not in _ELASTICITY_OK_MEMO:
        from ..utils import probe_cache

        hit = probe_cache.get("elasticity_fused_ok", key)
        if hit is None:
            hit = _probe_fused(op)
            probe_cache.put("elasticity_fused_ok", key, hit)
        _ELASTICITY_OK_MEMO[memo_key] = hit
    return _ELASTICITY_OK_MEMO[memo_key]


def _probe_fused(op) -> bool:
    import sys

    p = op.degree
    n0, n1, n2 = op.n
    t = jax.ShapeDtypeStruct(
        (n0 * p, n1 * p, n2 * p + op.zpad), jnp.float32
    )
    # stacked stencil input as smooth() passes it: the full grid, z lanes
    # extended to the kernel's Z when zpad (pad of zpad-1 over n2*p+1)
    zfull = n2 * p + op.zpad if op.zpad else n2 * p + 1
    full = jax.ShapeDtypeStruct(
        (3, n0 * p + 1, n1 * p + 1, zfull), jnp.float32
    )
    scal = np.asarray([0.5, 0.5], np.float32)

    def cheb(*ts):
        outs = op._run("cheb", ts[:3], ts[3:9], scal)
        return outs[0].ravel()[:1]

    def resid(u, *ts):
        outs = op._run("residual", u, ts, scal)
        return outs[0].ravel()[:1]

    try:
        jax.jit(cheb).lower(*(t,) * 9).compile()
        jax.jit(resid).lower(full, *(t,) * 3).compile()
        return True
    except Exception as e:  # noqa: BLE001 — Mosaic crashes surface here
        print(
            f"pallas elasticity FUSED-mode compile probe failed: "
            f"block={op.bx}x{op.by} n={op.n} p={op.degree} zpad={op.zpad} "
            f"core={op.core}: {type(e).__name__}: "
            f"{str(e).splitlines()[0][:200] if str(e) else ''}; "
            f"falling back to XLA smoother epilogues",
            file=sys.stderr,
        )
        return False


def make_elasticity_auto(
    space: FESpace,
    dtype=jnp.float32,
    mu: float = 1.0,
    lam: float = 1.0,
    precision: str = "high",
):
    """Fastest eligible elasticity operator: banded Pallas kernel on
    TPU-eligible f32 grids (compile-probed), assembled-Kronecker XLA
    fallback elsewhere (kron wins the XLA variant shoot-out at every size,
    PERFORMANCE.md round-4)."""
    if (
        dtype == jnp.float32
        and space.dim == 3
        and jax.default_backend() != "cpu"
        and space.degree not in _BANDED_CRASH_DEGREES
    ):
        lanes = space.mesh.cells_per_axis * space.degree + lane_pad(space)
        # 3 blocked outputs + 27 roll sets: the 16x16 banded envelope is
        # tighter than the scalar kernel's (residual3t precedent) — probe
        # 16x16 only at <= 256 lanes, like the scalar auto path
        cands = ((16, 16), (8, 8)) if lanes <= 256 else ((8, 8),)
        n_cells = space.mesh.cells_per_axis
        if n_cells < 8:
            cands = cands + ((n_cells, n_cells),)
        for bx, by in cands:
            if pallas_eligible(space, bx, by):
                op = make_pallas_elasticity(
                    space, dtype, mu=mu, lam=lam, bx=bx, by=by
                )
                if elasticity_compile_ok(op):
                    return op
    return make_elasticity(
        space, dtype, mu=mu, lam=lam, variant="kron", precision=precision
    )
