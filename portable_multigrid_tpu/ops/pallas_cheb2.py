"""Two-step fused Chebyshev kernel: TWO recurrence steps per HBM pass.

The single-step fused "cheb" mode (ops/pallas_laplace.py:_run) already runs
at ~80% of its HBM stream bound, so the only way further is algorithmic:
fuse recurrence steps so the r/d/x streams cross HBM once per PAIR of steps
instead of once per step.  This kernel computes

    r1 = r  - M A M d            d1 = c0a d  + (c1a / diag) r1
    r2 = r1 - M A M d1           d2 = c0b d1 + (c1b / diag) r2
    x2 = x + d1 + d2

in one pass: 3 reads + 3 writes for two steps (the unfused pair costs
6 + 6).  The catch is that the second application A d1 needs d1 COMPLETED
within the stencil radius p of every output point, which the one-step
kernel's sequential carry planes cannot provide (the next block has not run
yet).  Instead of carries, each grid block reads a HALO-EXTENDED window of
the d stream (2p extra rows per side in x and y), computes step one
redundantly on a +/-p extended region, and derives step two exactly on the
interior block — trading a ~1.2-1.4x compute overlap for halving the
smoother's HBM traffic, the classic overlapped-halo trick of stencil
time-tiling.  The matrices are window slices of the GLOBAL mask-folded
assembled 1D operators (translation handled by per-block matrix stacks), so
no carry completion is needed: every in-window output row is exact.

Contractions run the "mxu" scheme of ops/pallas_laplace.py (bf16 operands,
f32 accumulation on the systolic array) — smoother-grade, the same engine
the production recurrence already uses; convergence-count preservation is
pinned by tests/test_pallas_cheb2.py.

Reference being accelerated: the Chebyshev smoother loop of
deal.II's PreconditionChebyshev as consumed by the reference driver
(reference: source/geometric_multigrid/program.cc:259-287); the reference
has no analog of cross-step fusion — each smoother step is a full
vmult + vector updates (include/multigrid/portable_v_cycle_multigrid.h:96-126).

State convention: TRIMMED recurrence state (the fused pipeline's native
representation — global last planes dropped, constrained entries
identically zero), identical to the single-step "cheb" mode.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem.space import FESpace
from ..utils.pytree import pytree_dataclass, static_field
from .laplace import assembled_1d_matrices, diagonal_1d_factors
from .pallas_laplace import _masked_z_matrices, lane_pad, pallas_eligible


def _roundup8(v: int) -> int:
    return -(-v // 8) * 8


def cheb2_eligible(space: FESpace, bx: int, by: int,
                   zpad: int | None = None, n_stencils: int = 2) -> bool:
    """Pallas eligibility plus the window-geometry constraints: the halo'd
    y windows must start 8-aligned (block rows >= the rounded halo) and the
    x halo must fit inside one neighbouring block.  ``n_stencils=3`` is the
    rout ("pair + r_out") geometry — one extra stencil reach per side."""
    if not pallas_eligible(space, bx, by, zpad):
        return False
    p = space.degree
    return (bx * p >= n_stencils * p
            and by * p >= _roundup8(n_stencils * p))


def _win_stack(G: np.ndarray, nb: int, blk: int, row_off: int, rows: int,
               col_off: int, cols: int) -> np.ndarray:
    """Per-block window slices of the global matrix ``G``:
    out[b][a, c] = G[b*blk - row_off + a, b*blk - col_off + c]
    (zero outside the global extent)."""
    N = G.shape[0]
    out = np.zeros((nb, rows, cols), G.dtype)
    for b in range(nb):
        r0 = b * blk - row_off
        c0 = b * blk - col_off
        ra, rb = max(0, -r0), min(rows, N - r0)
        ca, cb = max(0, -c0), min(cols, N - c0)
        if ra < rb and ca < cb:
            out[b, ra:rb, ca:cb] = G[r0 + ra: r0 + rb, c0 + ca: c0 + cb]
    return out


def _fac_stack(g: np.ndarray, N: int, nb: int, blk: int, off: int,
               ext: int) -> np.ndarray:
    """Per-block window slices of a 1D diagonal factor (fill 1.0 outside the
    trimmed extent: state is identically zero there, 0/1 stays zero)."""
    out = np.ones((nb, ext), np.float64)
    for b in range(nb):
        r0 = b * blk - off
        ra, rb = max(0, -r0), min(ext, N - r0)
        if ra < rb:
            out[b, ra:rb] = g[r0 + ra: r0 + rb]
    return out


@pytree_dataclass
class Cheb2Kernel:
    """Two-step fused Chebyshev recurrence kernel (see module docstring).

    Modes of :meth:`steps2`:
      * "cheb2":    inputs (d, r, x), outputs (r2, d2, x2);
      * "cheb2l":   pair ENDS the recurrence — only x2 is written;
      * "chebd2":   x == d on entry (zero-initial-guess first pair), the x
                    read is skipped; outputs (r2, d2, x2);
      * "chebd2l":  both (degree-3 smoother in one launch): only x2;
      * "cheb2f0":  the preconditioner-entry pair FROM THE RHS: the only
                    input stream is b (passed in the ``d`` slot) — the
                    kernel computes d0 = b / (theta * diag) on the window,
                    r0 = b (a slice of the same window), x0 = d0, then runs
                    the pair.  Replaces apply()'s separate XLA d0 pass and
                    the r-stream read entirely; scal carries theta in
                    position 4.
      * "cheb2f0l": ditto, recurrence ends with the pair (degree 3).
      * "cheb2lr":  recurrence-ENDING pair that ALSO emits the next
                    V-cycle residual (``rout=True`` kernels only): a THIRD
                    stencil application r_out = r2 - A d2 rides the same
                    HBM pass, so the pre-restriction ``residual1t`` kernel
                    disappears entirely (VERDICT r4 item 2).  The residual
                    is built INCREMENTALLY from recurrence-scale state
                    (r_out = rhs - A x2 algebraically, but never formed by
                    the operator-norm-scale cancellation that makes naive
                    bf16 residuals unusable — CLAUDE.md round-2 lesson);
                    outputs (x2 f32, r_out f32).
    """

    degree: int = static_field()
    n: tuple = static_field()
    bx: int = static_field()
    by: int = static_field()
    zpad: int = static_field(default=0)
    interpret: bool = static_field(default=False)
    # exact=True stores f32 matrices and skips the bf16 data rounding —
    # interpret-mode testing only (f32 non-default-precision dots crash
    # Mosaic on the x pattern; the production grade is bf16 "mxu")
    exact: bool = static_field(default=False)
    # xext=True: the d/r inputs arrive X-EXTENDED (the x halos — 2p planes
    # for d, p for r, per side — are REAL neighbour data appended by the
    # sharded caller's ppermute exchange; zeros at the global ends).  Every
    # x window is then an interior window at a pure-product start, and the
    # per-block matrix stacks are the per-shard slices of the GLOBAL
    # stacks (shard_map partitions their leading axis).  This gives the
    # slab-sharded pair smoother the same kernel as the single chip —
    # reference parity: one hot kernel serial and MPI
    # (include/operators/portable_laplace_operator.h:557-719).
    xext: bool = static_field(default=False)
    # yext=True: ditto for the y axis (2D pencil sharding over a 2D device
    # mesh, parallel/mesh2d.py).  The y halos are Hd = roundup8(2p) planes
    # of d and Hr = roundup8(p) of r per side (the y window offsets use the
    # 8-rounded halo, so the caller ships the rounded count); every y window
    # then starts at the 8-aligned jj*by*p.  With xext AND yext set, the
    # pair kernel runs unchanged on an (x, y)-pencil shard — the same hot
    # kernel for serial, 1D-slab and 2D-pencil runs (reference parity:
    # include/operators/portable_laplace_operator.h:557-719).
    yext: bool = static_field(default=False)
    # rout=True: the S=3 ("pair + r_out") geometry — mats carry a third
    # stage stack and the windows one extra stencil reach; such kernels run
    # ONLY mode "cheb2lr"
    rout: bool = static_field(default=False)
    mats: tuple = None  # (Kz, Mz, then per-stage (Kx, Mx, Ky, My) x S)
    facs: tuple = None  # (f1xK, f1xM, f1yK, f1yM, fzK, fzM)

    def steps2(self, d, r, x, scal, mode: str = "cheb2",
               sdtype: str = "f32"):
        p = self.degree
        n0, n1, n2 = self.n
        bx, by = self.bx, self.by
        bxp, byp = bx * p, by * p
        nbi, nbj = n0 // bx, n1 // by
        N0t, N1t = n0 * p, n1 * p
        Z = n2 * p + self.zpad
        rout_mode = mode == "cheb2lr"
        assert rout_mode == self.rout, (
            "mode cheb2lr requires a rout=True kernel (and vice versa)")
        S = 3 if self.rout else 2  # chained stencil applications per pass
        e1, e2 = (S - 1) * p, (S - 2) * p  # stage-1/2 region extensions
        Hd = _roundup8(S * p)  # d-window y halo (8-aligned DMA starts)
        Hr = _roundup8(e1)
        Wx, Wy = bxp + 2 * S * p, byp + 2 * Hd  # d window (x halo exact:
        Rx, Ry = bxp + 2 * e1, byp + 2 * Hr  # outer dim slices align-free)
        E1x, E1y = bxp + 2 * e1, byp + 2 * e1  # stage-1 extended region
        E2x, E2y = bxp + 2 * e2, byp + 2 * e2  # stage-2 region
        f32 = jnp.float32
        sd = jnp.bfloat16 if sdtype == "bf16" else f32
        has_x = mode in ("cheb2", "cheb2l", "cheb2lr")
        from_rhs = mode in ("cheb2f0", "cheb2f0l")
        has_r = not from_rhs
        last = mode in ("cheb2l", "chebd2l", "cheb2f0l")
        out_dtypes = ((f32, f32) if rout_mode
                      else (f32,) if last else (sd, sd, f32))
        n_outs = len(out_dtypes)
        ddt = d.dtype
        rdt = r.dtype if has_r else ddt

        n_mats = len(self.mats)
        n_facs = len(self.facs)

        def kernel(d_hbm, *refs):
            if has_r:
                r_hbm = refs[0]
            refs = refs[1 if has_r else 0:]
            if self.rout:
                (Kz_r, Mz_r, s1kx, s1mx, s1ky, s1my,
                 s2kx, s2mx, s2ky, s2my,
                 s3kx, s3mx, s3ky, s3my) = refs[:n_mats]
            else:
                (Kz_r, Mz_r, s1kx, s1mx, s1ky, s1my,
                 s2kx, s2mx, s2ky, s2my) = refs[:n_mats]
            pos = n_mats
            (f0xk, f0xm, f0yk, f0ym, fzk, fzm) = refs[pos: pos + n_facs]
            pos += n_facs
            scal_r = refs[pos]
            pos += 1
            if has_x:
                x_r = refs[pos]
                pos += 1
            out_refs = refs[pos: pos + n_outs]
            if has_r:
                (slab_d, slab_r, sems) = refs[pos + n_outs:]
            else:
                (slab_d, sems) = refs[pos + n_outs:]
                slab_r = None

            i = pl.program_id(0)
            j = pl.program_id(1)
            k = i * nbj + j
            islot = jax.lax.rem(k, jnp.int32(2))

            def axis_cases(ii, nb, blk, halo, W, Nt, ext=False):
                """(pred, src_start, rows, dst_off) DMA cases along one axis
                (None pred = unconditional).  Static sizes per case — Mosaic
                DMA extents must be compile-time constants.  ``ext``: the
                input already carries the halo (sharded x axis) — every
                window is interior.  Starts are emitted as explicit
                8 * (...) products where divisible: the 2026 Mosaic pass
                requires sublane (dim-1) slice starts to be PROVABLY
                8-divisible, and "ii*blk - halo" only proves as a syntactic
                product (cf. ops/pallas_transfer.py)."""
                prov8 = blk % 8 == 0 and halo % 8 == 0

                def s_interior(v):  # v*blk - halo
                    if prov8:
                        return (v * (blk // 8) - (halo // 8)) * 8
                    return v * blk - halo

                def s_plain(v):  # v*blk
                    if blk % 8 == 0:
                        return (v * (blk // 8)) * 8
                    return v * blk

                if ext:
                    return [(None, s_plain(ii), W, 0)]
                if nb == 1:
                    return [(None, 0, min(blk, Nt), halo)]
                cases = [(ii == 0, 0, blk + halo, halo)]
                if nb > 2:
                    cases.append((
                        jnp.logical_and(ii > 0, ii < nb - 1),
                        s_interior(ii), W, 0,
                    ))
                cases.append((ii == nb - 1, s_interior(ii), blk + halo, 0))
                return cases

            def fetch(slot, ii, jj, slab, hbm, hx, hy, W0, W1, sem, start):
                for (px, xs, xr, xo) in axis_cases(ii, nbi, bxp, hx, W0,
                                                   N0t, ext=self.xext):
                    for (py, ys, yr, yo) in axis_cases(
                            jj, nbj, byp, hy, W1, N1t, ext=self.yext):

                        def do(xs=xs, xr=xr, xo=xo, ys=ys, yr=yr, yo=yo):
                            cp = pltpu.make_async_copy(
                                hbm.at[pl.ds(xs, xr), pl.ds(ys, yr),
                                       pl.ds(0, Z)],
                                slab.at[slot, xo: xo + xr, yo: yo + yr, :],
                                sems.at[sem + slot],
                            )
                            cp.start() if start else cp.wait()

                        if px is None and py is None:
                            do()
                        elif px is None:
                            pl.when(py)(do)
                        elif py is None:
                            pl.when(px)(do)
                        else:
                            pl.when(jnp.logical_and(px, py))(do)

            def zero_strips(slot, ii, jj, slab, hx, hy, W0, W1, dt):
                def zx(lo, n_):
                    slab[slot, lo: lo + n_, :, :] = jnp.zeros((n_, W1, Z), dt)

                def zy(lo, n_):
                    slab[slot, :, lo: lo + n_, :] = jnp.zeros((W0, n_, Z), dt)

                if not self.xext:  # extended inputs carry real x halos
                    pl.when(ii == 0)(lambda: zx(0, hx))
                    pl.when(ii == nbi - 1)(lambda: zx(W0 - hx, hx))
                if not self.yext:  # ditto for pencil-sharded y
                    pl.when(jj == 0)(lambda: zy(0, hy))
                    pl.when(jj == nbj - 1)(lambda: zy(W1 - hy, hy))

            def start_fetch(slot, ii, jj):
                zero_strips(slot, ii, jj, slab_d, S * p, Hd, Wx, Wy, ddt)
                fetch(slot, ii, jj, slab_d, d_hbm, S * p, Hd, Wx, Wy, 0,
                      True)
                if has_r:
                    zero_strips(slot, ii, jj, slab_r, e1, Hr, Rx, Ry, rdt)
                    fetch(slot, ii, jj, slab_r, r_hbm, e1, Hr, Rx, Ry, 2,
                          True)

            @pl.when(k == 0)
            def _():
                start_fetch(jnp.int32(0), i, j)

            @pl.when(k + 1 < nbi * nbj)
            def _():
                k1 = k + 1
                start_fetch(1 - islot, k1 // nbj,
                            jax.lax.rem(k1, jnp.int32(nbj)))

            fetch(islot, i, j, slab_d, d_hbm, S * p, Hd, Wx, Wy, 0, False)
            if has_r:
                fetch(islot, i, j, slab_r, r_hbm, e1, Hr, Rx, Ry, 2, False)

            # ---- contraction engine (bf16 MXU, f32 accumulation) ----------
            bf16 = jnp.bfloat16
            # interpret mode (CPU) cannot execute some bf16 x bf16 dot
            # shapes ("DotThunk"): run the bf16-ROUNDED values through f32
            # dots — identical products
            up = ((lambda v: v.astype(f32)) if self.interpret
                  else (lambda v: v))
            cvt = ((lambda t: t.astype(f32)) if self.exact
                   else (lambda t: up(t.astype(bf16))))

            def dz(t, w_r):
                return jax.lax.dot_general(
                    cvt(t), up(w_r[...]), (((2,), (0,)), ((), ())),
                    preferred_element_type=f32)

            def dy(t, w2):
                w3 = jnp.broadcast_to(up(w2)[None],
                                      (t.shape[0],) + w2.shape)
                return jax.lax.dot_general(
                    w3, cvt(t), (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32)

            def dx(t, w2):
                return jax.lax.dot_general(
                    up(w2), cvt(t), (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)

            def apply_op(t, kx, mx, ky, my):
                b = dz(t, Mz_r)
                a = dz(t, Kz_r)
                mb = dy(b, my)
                kb = dy(b, ky)
                ma = dy(a, my)
                return dx(mb, kx) + dx(kb + ma, mx)

            c0a = scal_r[0, 0]
            c1a = scal_r[0, 1]
            c0b = scal_r[0, 2]
            c1b = scal_r[0, 3]
            fz_k, fz_m = fzk[...], fzm[...]
            # the inverse diagonal rebuilds in-VMEM from 1D factors at the
            # full d-window extent; step regions slice it
            diagw = (f0xk[0] * f0ym[0] * fz_m
                     + f0xm[0] * (f0yk[0] * fz_m + f0ym[0] * fz_k))
            diag1 = diagw[p: p + E1x, Hd - e1: Hd - e1 + E1y, :]
            diag2 = diag1[p: p + E2x, p: p + E2y, :]

            # ---- step one on the +/-e1 extended region ---------------------
            if from_rhs:
                # preconditioner entry: the window stream is b; the kernel
                # derives d0 = b / (theta diag), r0 = b, x0 = d0
                theta = scal_r[0, 4]
                d0w = slab_d[islot].astype(f32) / (theta * diagw)
                raw1 = apply_op(d0w, s1kx[0], s1mx[0], s1ky[0], s1my[0])
                r1 = slab_d[islot, p: p + E1x, Hd - e1: Hd - e1 + E1y,
                            :].astype(f32) - raw1
                dE1 = d0w[p: p + E1x, Hd - e1: Hd - e1 + E1y, :]
            else:
                raw1 = apply_op(slab_d[islot], s1kx[0], s1mx[0], s1ky[0],
                                s1my[0])
                r1 = slab_r[islot, 0:E1x, Hr - e1: Hr - e1 + E1y, :].astype(
                    f32) - raw1
                dE1 = slab_d[islot, p: p + E1x, Hd - e1: Hd - e1 + E1y,
                             :].astype(f32)
            d1 = c0a * dE1 + (c1a / diag1) * r1

            # ---- step two on the +/-e2 region (interior when S == 2) ------
            raw2 = apply_op(d1, s2kx[0], s2mx[0], s2ky[0], s2my[0])
            r1i = r1[p: p + E2x, p: p + E2y, :]
            d1i = d1[p: p + E2x, p: p + E2y, :]
            r2 = r1i - raw2
            d2 = c0b * d1i + (c1b / diag2) * r2
            if has_x:
                xb = x_r[...]
            elif from_rhs:
                xb = d0w[S * p: S * p + bxp, Hd: Hd + byp, :]
            else:
                xb = slab_d[islot, S * p: S * p + bxp,
                            Hd: Hd + byp, :].astype(f32)
            if rout_mode:
                # ---- stage three: the next V-cycle residual, exact on the
                # interior block — r_out = r2 - A d2 = rhs - A x2, built
                # incrementally at recurrence-state scale (no
                # operator-norm-scale cancellation)
                raw3 = apply_op(d2, s3kx[0], s3mx[0], s3ky[0], s3my[0])
                r_out = r2[p: p + bxp, p: p + byp, :] - raw3
                x2 = (xb + d1[2 * p: 2 * p + bxp, 2 * p: 2 * p + byp, :]
                      + d2[p: p + bxp, p: p + byp, :])
                out_refs[0][...] = x2
                out_refs[1][...] = r_out
                return
            x2 = xb + d1i + d2
            if last:
                out_refs[0][...] = x2
            else:
                out_refs[0][...] = r2.astype(out_dtypes[0])
                out_refs[1][...] = d2.astype(out_dtypes[1])
                out_refs[2][...] = x2

        blk_spec = pl.BlockSpec((bxp, byp, Z), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)

        def bspec(shape, which):
            idx = ((lambda i, j: (i,) + (0,) * (len(shape) - 1))
                   if which == "i"
                   else (lambda i, j: (j,) + (0,) * (len(shape) - 1)))
            return pl.BlockSpec((1,) + shape[1:], idx,
                                memory_space=pltpu.VMEM)

        Kz, Mz = self.mats[0], self.mats[1]
        stage_mats = self.mats[2:]  # (Kx, Mx, Ky, My) per stage
        in_specs = [pl.BlockSpec(memory_space=pl.ANY)]  # d (or b)
        operands = [d]
        if has_r:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            operands.append(r)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Kz
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Mz
        ]
        for s in range(0, len(stage_mats), 4):
            kxm, mxm, kym, mym = stage_mats[s: s + 4]
            in_specs += [bspec(kxm.shape, "i"), bspec(mxm.shape, "i"),
                         bspec(kym.shape, "j"), bspec(mym.shape, "j")]
        operands += [Kz, Mz, *stage_mats]
        (f0xK, f0xM, f0yK, f0yM, fzK, fzM) = self.facs
        for f in (f0xK, f0xM):
            in_specs.append(bspec(f.shape, "i"))
        for f in (f0yK, f0yM):
            in_specs.append(bspec(f.shape, "j"))
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2  # fzK, fzM
        operands += [f0xK, f0xM, f0yK, f0yM, fzK, fzM]
        scal6 = jnp.zeros((1, 6), jnp.float32).at[0, : len(scal)].set(
            jnp.asarray(scal, jnp.float32)
        )
        operands.append(scal6)
        in_specs.append(pl.BlockSpec((1, 6), lambda i, j: (0, 0),
                                     memory_space=pltpu.SMEM))
        if has_x:
            operands.append(x)
            in_specs.append(blk_spec)

        out_shape = tuple(
            jax.ShapeDtypeStruct((N0t, N1t, Z), dt) for dt in out_dtypes
        )
        scratch = [pltpu.VMEM((2, Wx, Wy, Z), ddt)]
        if has_r:
            scratch.append(pltpu.VMEM((2, Rx, Ry, Z), rdt))
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
        fn = pl.pallas_call(
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
        return fn(*operands)


def make_cheb2(
    space: FESpace,
    dtype=jnp.float32,
    bx: int = 16,
    by: int = 8,
    zpad: int | None = None,
    interpret: bool = False,
    exact: bool = False,
    rout: bool = False,
) -> Cheb2Kernel:
    """Build the two-step kernel for a pallas-eligible level.

    ``rout=True`` builds the S=3 "pair + r_out" kernel (mode "cheb2lr"
    only): windows carry one extra stencil reach and a third per-stage
    matrix stack computes the trailing residual application."""
    S = 3 if rout else 2
    if not (interpret or cheb2_eligible(space, bx, by, zpad,
                                        n_stencils=S)):
        raise ValueError("level not eligible for the cheb2 kernel")
    p = space.degree
    n = space.mesh.cells_per_axis
    if zpad is None:
        zpad = lane_pad(space)
    bxp, byp = bx * p, by * p
    nbi, nbj = n // bx, n // by
    Nt = n * p
    Z = Nt + zpad
    e1, e2 = (S - 1) * p, (S - 2) * p
    Hd = _roundup8(S * p)
    Wx, Wy = bxp + 2 * S * p, byp + 2 * Hd
    E1x, E1y = bxp + 2 * e1, byp + 2 * e1
    E2x, E2y = bxp + 2 * e2, byp + 2 * e2

    K1, M1 = assembled_1d_matrices(space)
    m1 = space.free_mask_1d()
    Kg = (m1[:, None] * K1 * m1[None, :])[:Nt, :Nt]
    Mg = (m1[:, None] * M1 * m1[None, :])[:Nt, :Nt]
    Kzm, Mzm = _masked_z_matrices(K1, M1, m1, Nt, Z)

    mdt = jnp.float32 if exact else jnp.bfloat16
    mats = [
        jnp.asarray(Kzm, mdt),
        jnp.asarray(Mzm, mdt),
        # stage 1: rows = +/-e1 extended region, cols = the d window
        jnp.asarray(_win_stack(Kg, nbi, bxp, e1, E1x, S * p, Wx), mdt),
        jnp.asarray(_win_stack(Mg, nbi, bxp, e1, E1x, S * p, Wx), mdt),
        jnp.asarray(_win_stack(Kg, nbj, byp, e1, E1y, Hd, Wy), mdt),
        jnp.asarray(_win_stack(Mg, nbj, byp, e1, E1y, Hd, Wy), mdt),
        # stage 2: rows = +/-e2 region, cols = the stage-1 region
        jnp.asarray(_win_stack(Kg, nbi, bxp, e2, E2x, e1, E1x), mdt),
        jnp.asarray(_win_stack(Mg, nbi, bxp, e2, E2x, e1, E1x), mdt),
        jnp.asarray(_win_stack(Kg, nbj, byp, e2, E2y, e1, E1y), mdt),
        jnp.asarray(_win_stack(Mg, nbj, byp, e2, E2y, e1, E1y), mdt),
    ]
    if rout:
        # stage 3 (residual): rows = interior block, cols = stage-2 region
        mats += [
            jnp.asarray(_win_stack(Kg, nbi, bxp, 0, bxp, e2, E2x), mdt),
            jnp.asarray(_win_stack(Mg, nbi, bxp, 0, bxp, e2, E2x), mdt),
            jnp.asarray(_win_stack(Kg, nbj, byp, 0, byp, e2, E2y), mdt),
            jnp.asarray(_win_stack(Mg, nbj, byp, 0, byp, e2, E2y), mdt),
        ]
    gK, gM = diagonal_1d_factors(space)
    zdK = np.asarray(gK[:Nt], np.float64)
    zdM = np.asarray(gM[:Nt], np.float64)
    if zpad:
        zdK = np.pad(zdK, (0, zpad), constant_values=1.0)
        zdM = np.pad(zdM, (0, zpad), constant_values=1.0)

    def xs(g, off, ext):
        return jnp.asarray(
            _fac_stack(g, Nt, nbi, bxp, off, ext)[:, :, None, None], dtype)

    def ys(g, off, ext):
        return jnp.asarray(
            _fac_stack(g, Nt, nbj, byp, off, ext)[:, None, :, None], dtype)

    # diagonal factors at the full d-window extent; step regions are slices
    facs = (
        xs(gK, S * p, Wx), xs(gM, S * p, Wx),
        ys(gK, Hd, Wy), ys(gM, Hd, Wy),
        jnp.asarray(zdK.reshape(1, 1, -1), dtype),
        jnp.asarray(zdM.reshape(1, 1, -1), dtype),
    )
    return Cheb2Kernel(
        degree=p,
        n=(n,) * space.dim,
        bx=bx,
        by=by,
        zpad=zpad,
        interpret=interpret,
        exact=exact,
        rout=rout,
        mats=tuple(mats),
        facs=facs,
    )


def cheb2_vmem_ok(bx: int, by: int, p: int, Z: int,
                  n_stencils: int = 2) -> bool:
    """Heuristic VMEM budget for one (bx, by) block configuration."""
    S = n_stencils
    bxp, byp = bx * p, by * p
    Hd = _roundup8(S * p)
    Hr = _roundup8((S - 1) * p)
    Wx, Wy = bxp + 2 * S * p, byp + 2 * Hd
    Rx, Ry = bxp + 2 * (S - 1) * p, byp + 2 * Hr
    E1x, E1y = bxp + 2 * (S - 1) * p, byp + 2 * (S - 1) * p
    est = 4 * (
        2 * Wx * Wy * Z // 2       # d slabs (bf16)
        + 2 * Rx * Ry * Z // 2     # r slabs (bf16)
        + 2 * bxp * byp * Z        # x blocked in (f32, pipelined x2)
        + 2 * 2 * bxp * byp * Z    # outs (r2+d2 bf16 + x2 f32) x2
        + 7 * Wx * Wy * Z          # live step-1 intermediates (f32)
        + 5 * E1x * E1y * Z        # live step-2 intermediates
    )
    return est < 110 * 1024 * 1024


# process-level memo of compile-probe outcomes: (n, p, zpad, bx, by,
# sdtype, modes) -> bool.  Repeated level builds (bench + model in one
# process, multi-solve sessions) must not re-pay the remote AOT compile.
_COMPILE_OK_MEMO: dict = {}

# the production smoother (degree 5, V(2,2)) exercises exactly these pair
# modes: "cheb2f0" (preconditioner entry from the rhs), "cheb2" (mid pair
# of smooth()), "cheb2l" (recurrence-ending pair)
_PRODUCTION_MODES = ("cheb2f0", "cheb2", "cheb2l")


def cheb2_compile_ok(kern: Cheb2Kernel, sdtype: str = "bf16",
                     modes: tuple = _PRODUCTION_MODES) -> bool:
    """AOT-compile the pair kernel's production modes on the current
    backend; False when the Mosaic compile crashes.

    The Mosaic crash envelope is empirical (CLAUDE.md round-3 rules), so a
    block shape that passes the static eligibility + VMEM checks can still
    kill the compile.  This probe turns that crash into a recoverable
    signal: all ``modes`` compile in ONE jitted program (one remote-compile
    round trip), nothing executes."""
    if kern.interpret:
        return True  # interpret mode never reaches Mosaic — skip the memos
    key = (kern.n, kern.degree, kern.bx, kern.by, kern.zpad, sdtype,
           tuple(modes))
    if key not in _COMPILE_OK_MEMO:
        from ..utils import probe_cache

        hit = probe_cache.get("cheb2_ok", key)
        if hit is None:
            hit = _compile_probe(kern, sdtype, modes)
            probe_cache.put("cheb2_ok", key, hit)
        _COMPILE_OK_MEMO[key] = hit
    return _COMPILE_OK_MEMO[key]


def _compile_probe(kern: Cheb2Kernel, sdtype: str, modes: tuple) -> bool:
    if kern.interpret:
        return True
    p = kern.degree
    n0, n1, n2 = kern.n
    shape = (n0 * p, n1 * p, n2 * p + kern.zpad)
    f32 = jnp.float32
    sd = jnp.bfloat16 if sdtype == "bf16" else f32
    scal = np.asarray([0.5, 0.4, 0.3, 0.2, 1.1], np.float32)

    def prog(b, r, d, x):
        acc = jnp.zeros((), f32)
        for mode in modes:
            if mode in ("cheb2f0", "cheb2f0l"):
                outs = kern.steps2(b, None, None, scal, mode, sdtype=sdtype)
            elif mode in ("chebd2", "chebd2l"):
                outs = kern.steps2(d, r, None, scal[:4], mode, sdtype=sdtype)
            else:
                outs = kern.steps2(d, r, x, scal[:4], mode, sdtype=sdtype)
            outs = outs if isinstance(outs, tuple) else (outs,)
            acc = acc + sum(o.ravel()[0].astype(f32) for o in outs)
        return acc

    args = (
        jax.ShapeDtypeStruct(shape, f32),   # b (entry-pair rhs stream)
        jax.ShapeDtypeStruct(shape, sd),    # r
        jax.ShapeDtypeStruct(shape, sd),    # d
        jax.ShapeDtypeStruct(shape, f32),   # x
    )
    try:
        jax.jit(prog).lower(*args).compile()
        return True
    except Exception as e:  # noqa: BLE001 — Mosaic crashes surface here
        import sys

        print(
            f"cheb2 compile probe failed for block {kern.bx}x{kern.by} on "
            f"n={kern.n} p={p} zpad={kern.zpad}: {type(e).__name__}; "
            "degrading to the next ladder rung", file=sys.stderr,
        )
        return False


def make_cheb2_auto(space: FESpace, dtype=jnp.float32,
                    interpret: bool = False, validate: bool | None = None,
                    rout: bool = False):
    """Block-size auto-pick with the full Mosaic-crash fallback ladder;
    None if no candidate survives (callers then run the single-step fused
    pipeline — FusedChebyshev with op_cheb2=None — which degrades further
    to the plain Chebyshev smoother on non-Pallas operators).

    Ladder: auto block shape -> smaller Mosaic-proven shapes -> None.  Each
    candidate passes (a) static eligibility, (b) the VMEM budget estimate,
    and (c) — on a real TPU backend — an AOT compile probe
    (:func:`cheb2_compile_ok`), so the PMG_CHEB2=1 production default can
    never die on an empirically crash-listed shape (VERDICT r3 item 4).

    ``rout=True`` builds the S=3 "pair + r_out" kernel (the fused
    pre-restriction residual) — larger windows, so the probed candidate
    list is the small-block half of the ladder.

    PMG_CHEB2_BLOCK="BXxBY" (e.g. "8x8") restricts the candidate list to a
    single block shape; PMG_CHEB2_SKIP_BLOCKS="16x8,16x16" removes shapes
    (deployment escape hatches).  PMG_CHEB2_VALIDATE=0 disables the compile
    probe; ``validate`` overrides the auto-detection (used by the
    fault-injection tests)."""
    import os

    p = space.degree
    n = space.mesh.cells_per_axis
    Z = n * p + lane_pad(space)
    S = 3 if rout else 2
    # >256 lanes: the 2026-08 toolchain lifted the round-3 16x16 Mosaic
    # crash, and 16x16 pairs measure FASTEST at the r=7 512-lane fine
    # level (11.66 vs 13.08 ms for 8x8, experiments/r4_batch5.py) — put it
    # first; the compile probe below still guards unproven shapes.
    cands = [(16, 8), (8, 8), (16, 16)] if Z <= 256 else [
        (16, 16), (16, 8), (8, 8)]
    if rout:
        # the S=3 windows carry ~1.5x the slab VMEM: lead with the proven
        # smaller shapes at wide lanes (r5_batch2 measurements)
        cands = [(16, 8), (8, 8), (16, 16)] if Z <= 256 else [
            (16, 8), (8, 8), (16, 16)]
    forced = os.environ.get("PMG_CHEB2_BLOCK")
    if forced:
        bx, by = (int(v) for v in forced.lower().split("x"))
        cands = [(bx, by)]
    skip = {
        tuple(int(v) for v in blk.lower().split("x"))
        for blk in os.environ.get("PMG_CHEB2_SKIP_BLOCKS", "").split(",")
        if blk.strip()
    }
    if validate is None:
        validate = (
            not interpret
            and os.environ.get("PMG_CHEB2_VALIDATE", "1") == "1"
            and jax.default_backend() not in ("cpu",)
        )
    def ok(bx, by):
        if interpret:
            # interpret mode has no Mosaic lane constraint: keep only the
            # block-divisibility + window-geometry requirements (lets the
            # ladder run on the tiny CPU test grids)
            return (n % bx == 0 and n % by == 0 and bx * p >= S * p
                    and by * p >= _roundup8(S * p))
        return cheb2_eligible(space, bx, by, n_stencils=S)

    for bx, by in cands:
        if (bx, by) in skip:
            continue
        if not ok(bx, by):
            continue
        if not cheb2_vmem_ok(bx, by, p, Z, n_stencils=S) and not validate:
            # the static VMEM estimate is conservative (it counts every
            # step intermediate as simultaneously live): when a real AOT
            # compile probe runs, Mosaic's own scoped-allocation check is
            # authoritative (16x16@512 lanes overshoots the estimate but
            # compiles and runs fastest, experiments/r4_batch5.py); without
            # a probe (interpret/CPU or PMG_CHEB2_VALIDATE=0) stay safe.
            continue
        kern = make_cheb2(space, dtype, bx=bx, by=by, interpret=interpret,
                          rout=rout)
        if validate and not cheb2_compile_ok(
                kern, modes=(("cheb2lr",) if rout else _PRODUCTION_MODES)):
            continue
        return kern
    return None
