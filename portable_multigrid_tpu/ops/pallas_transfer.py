"""Fused Pallas transfer kernels: restrict / prolongate(+add) in ONE pass.

TPU-native replacement for the XLA per-axis schedule in ops/transfer.py on
pallas-eligible 3D levels (reference kernels being replaced:
include/multigrid/portable_geometric_transfer.h:90-684).  The separable
transfer is three dense 1D contractions

    P = Px (x) Py (x) Pz,    P_ax = diag(w_f * m_f) E_ax diag(m_c)

with E_ax the overlap-added window embedding — weights, valence halving and
Dirichlet masks all fold into the per-axis matrices host-side, so the kernel
is pure contraction.  Each grid block reads a halo'd input window via manual
DMA (Mosaic sublane alignment handled by widening the per-block matrices
with zero columns — the window start just rounds down to the alignment),
contracts the two small axes first (shrinking the data before the large
lane-axis matmul), and writes disjoint output tiles through the standard
Pallas output pipeline.  The contractions run as hi/lo-split bf16 MXU
matmuls (~1e-7 relative, the "mxu3" scheme of ops/pallas_laplace.py) — the
flop count is trivial, so the kernel runs at its HBM stream bound instead of
the ~8x-over-stream XLA window shuffle (PERFORMANCE.md round-2 budget).

State convention: both sides TRIMMED (the fused pipeline's native
representation: global last plane per axis dropped, constrained entries
zero).  ``coarse_trimmed=False`` pads/trims the (small) coarse side so the
kernel can hand off to full-representation XLA levels.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem.basis import h_prolongation_matrix_1d
from ..fem.space import FESpace
from ..utils.pytree import pytree_dataclass, static_field
from .transfer import Transfer, _weights_1d


def _axis_matrix_1d(M1: np.ndarray, n_c: int, stride_c: int, stride_f: int,
                    wmask_f: np.ndarray, mask_c: np.ndarray) -> np.ndarray:
    """Full-grid 1D prolongation matrix [N_f, N_c] with weights and masks
    folded in — the exact algebra of ops/transfer.py:Transfer (split ->
    contract -> overlap-add -> weight), as one matrix."""
    N_f = n_c * stride_f + 1
    N_c = n_c * stride_c + 1
    E = np.zeros((N_f, N_c))
    for c in range(n_c):
        E[c * stride_f: c * stride_f + stride_f + 1,
          c * stride_c: c * stride_c + stride_c + 1] += M1
    return wmask_f[:, None] * E * mask_c[None, :]


def _hilo(w: np.ndarray):
    hi = np.asarray(jnp.asarray(w, jnp.bfloat16))
    lo = np.asarray(w, np.float32) - np.asarray(hi, np.float32)
    return jnp.asarray(hi, jnp.bfloat16), jnp.asarray(lo, jnp.bfloat16)


PAD = 8  # input padding per side: windows live in a padded frame so every
# DMA start is a PURE multiple of the stride — conditionals, floor-div,
# min/max and SMEM reads in DMA start arithmetic all crash Mosaic
# (r3 batches 6-9)


def _window_blocks(P_t: np.ndarray, nb: int, out_w: int, win_w: int,
                   transpose: bool):
    """Per-block contraction matrices in the PADDED window frame.

    The kernel reads the input padded by PAD rows on each side; block b's
    window starts at b*stride (padded coords) = b*stride - PAD (global),
    width win_w = stride + 2*PAD, so nb*stride + 2*PAD == N_in + 2*PAD
    tiles the padded array exactly.  Matrix column k maps global input row
    b*stride - PAD + k (zero outside [0, N_in)).

    ``transpose=False``: prolongation, mats[b][o, k] = P_t[b*out_w + o, g].
    ``transpose=True``: restriction, mats[b][o, k] = P_t[g, b*out_w + o].
    """
    N_out, N_in = (P_t.shape[1], P_t.shape[0]) if transpose else P_t.shape
    stride = win_w - 2 * PAD
    assert nb * stride == N_in, (nb, stride, N_in)
    mats = np.zeros((nb, out_w, win_w), P_t.dtype)
    for b in range(nb):
        rows = slice(b * out_w, (b + 1) * out_w)
        for k in range(win_w):
            g = b * stride - PAD + k
            if 0 <= g < N_in:
                mats[b][:, k] = P_t[g, rows] if transpose else P_t[rows, g]
    return mats


def _check_cover(P_t: np.ndarray, nb: int, out_w: int, win_w: int,
                 transpose: bool) -> bool:
    """True iff every nonzero of P_t lands inside some block's window."""
    stride = win_w - 2 * PAD
    A = P_t.T if transpose else P_t
    for b in range(nb):
        rows = A[b * out_w: (b + 1) * out_w]
        nz = np.nonzero(np.any(rows != 0.0, axis=0))[0]
        if nz.size and (nz.min() < b * stride - PAD
                        or nz.max() >= b * stride - PAD + win_w):
            return False
    return True


@pytree_dataclass
class PallasTransfer:
    """Fused transfer between a trimmed fine pallas level and its coarser
    neighbour.  Drop-in for ops/transfer.py:TrimmedTransfer on eligible
    levels (same restrict/prolongate/prolongate_and_add surface)."""

    dim: int = static_field()
    shape_f: tuple = static_field()  # trimmed fine (X, Y, Z)
    shape_c: tuple = static_field()  # trimmed coarse
    bf: int = static_field()  # fine rows per block (x and y), restrict grid
    bc: int = static_field()  # coarse rows per block, prolongate grid
    win_r: int = static_field()  # fine window width (restrict)
    win_p: int = static_field()  # coarse window width (prolongate)
    coarse_trimmed: bool = static_field(default=True)
    interpret: bool = static_field(default=False)
    # per-direction operands: per-block x/y window matrices, full z matrix
    r_mats: tuple = None  # (Mx hi/lo [nbx,bc,win_r], My hi/lo, Mz hi/lo)
    p_mats: tuple = None

    def _contract(self, t, w_hi, w_lo, axis, out_w):
        """hi/lo bf16 MXU contraction of ``t`` axis ``axis`` with [out, in]."""
        bf16 = jnp.bfloat16
        hi = t.astype(bf16)
        lo = (t - hi.astype(jnp.float32)).astype(bf16)

        if axis == 2:  # lane axis: t[...,in] @ W[out,in]^T
            def d(a, w):
                return jax.lax.dot_general(
                    a, w, (((2,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
        elif axis == 0:
            def d(a, w):
                return jax.lax.dot_general(
                    w, a, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        else:  # axis == 1: batched over axis 0 — Mosaic dislikes 3D
            # transposes in-kernel, so broadcast W across the x rows and use
            # a batched dot (the operator kernel's dy pattern)
            def d(a, w):
                w3 = jnp.broadcast_to(w[None], (a.shape[0],) + w.shape)
                return jax.lax.dot_general(
                    w3, a, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

        return d(hi, w_hi) + d(lo, w_hi) + d(hi, w_lo)

    def _run(self, direction: str, src: jnp.ndarray, add=None):
        restrict = direction == "restrict"
        (Xf, Yf, Zf), (Xc, Yc, Zc) = self.shape_f, self.shape_c
        if restrict:
            out_shape, in_shape = self.shape_c, self.shape_f
            out_w, win_w = self.bc, self.win_r
            mats = self.r_mats
        else:
            out_shape, in_shape = self.shape_f, self.shape_c
            out_w, win_w = self.bf, self.win_p
            mats = self.p_mats
        nbx = out_shape[0] // out_w
        nby = out_shape[1] // out_w
        Zi, Zo = in_shape[2], out_shape[2]
        dtype = src.dtype
        n_add = 0 if add is None else 1

        (Mxh, Mxl, Myh, Myl, Mzh, Mzl) = mats
        # branch-fetched windows in the PADDED frame geometry: the window
        # matrices map column k to global input row b*stride - PAD + k, but
        # the input is NOT physically padded (a pad pass costs a full HBM
        # read+write of the fine array) — edge blocks fetch the in-range
        # rows at static offsets and zero-fill the out-of-range strips
        # (matrix columns there are zero; zeros guard against 0*garbage
        # NaNs).  Interior starts i*stride - PAD keep the affine form
        # Mosaic compiles (cf. ops/pallas_cheb2.py); grids too small for an
        # in-range interior start (stride < PAD) fall back to an XLA pad.
        stride = win_w - 2 * PAD
        Nx_in, Ny_in = in_shape[0], in_shape[1]
        pad_fallback = stride < PAD
        if pad_fallback:
            src = jnp.pad(src, ((PAD, PAD), (PAD, PAD), (0, 0)))

        # The 2026 Mosaic pass requires sublane (dim-1) slice starts to be
        # PROVABLY 8-divisible: "i*stride - PAD" is divisible in value but
        # the prover only accepts a syntactic product, so emit starts as
        # 8 * (...) when stride is an 8-multiple (PAD == 8 always is).
        prov8 = stride % 8 == 0

        def s_interior(ii):  # ii*stride - PAD, provably 8-divisible
            if prov8:
                return (ii * (stride // 8) - (PAD // 8)) * 8
            return ii * stride - PAD

        def s_plain(ii):  # ii*stride
            if prov8:
                return (ii * (stride // 8)) * 8
            return ii * stride

        def axis_cases(ii, nb, Nt):
            if pad_fallback:
                return [(None, s_plain(ii), win_w, 0)]
            if nb == 1:
                return [(None, 0, min(stride, Nt), PAD)]
            cases = [(ii == 0, 0, stride + PAD, PAD)]
            if nb > 2:
                cases.append((
                    jnp.logical_and(ii > 0, ii < nb - 1),
                    s_interior(ii), win_w, 0,
                ))
            cases.append((ii == nb - 1, s_interior(ii), stride + PAD, 0))
            return cases

        def kernel(src_hbm, mxh_r, mxl_r, myh_r, myl_r,
                   mzh_r, mzl_r, *rest):
            if n_add:
                add_r = rest[0]
            out_r = rest[n_add]
            win, sems = rest[n_add + 1:]
            i = pl.program_id(0)
            j = pl.program_id(1)
            k = i * nby + j
            islot = jax.lax.rem(k, jnp.int32(2))

            def fetch(slot, ii, jj, start):
                for (px, xs, xr, xo) in axis_cases(ii, nbx, Nx_in):
                    for (py, ys, yr, yo) in axis_cases(jj, nby, Ny_in):

                        def do(xs=xs, xr=xr, xo=xo, ys=ys, yr=yr, yo=yo):
                            cp = pltpu.make_async_copy(
                                src_hbm.at[pl.ds(xs, xr), pl.ds(ys, yr),
                                           pl.ds(0, Zi)],
                                win.at[slot, xo: xo + xr, yo: yo + yr, :],
                                sems.at[slot],
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

            def start_fetch(slot, ii, jj):
                if not pad_fallback:
                    # zero the halo strips of edge windows (cheap VPU
                    # writes; interior windows are fully DMA-overwritten)
                    zx = jnp.zeros((PAD, win_w, Zi), dtype)
                    zy = jnp.zeros((win_w, PAD, Zi), dtype)

                    @pl.when(ii == 0)
                    def _():
                        win[slot, 0:PAD, :, :] = zx

                    @pl.when(ii == nbx - 1)
                    def _():
                        win[slot, win_w - PAD: win_w, :, :] = zx

                    @pl.when(jj == 0)
                    def _():
                        win[slot, :, 0:PAD, :] = zy

                    @pl.when(jj == nby - 1)
                    def _():
                        win[slot, :, win_w - PAD: win_w, :] = zy
                fetch(slot, ii, jj, True)

            # double-buffered input: prefetch block k+1's window while
            # block k contracts (the kernel is DMA-latency-bound: the
            # matmul work is tiny next to the window fetch)
            @pl.when(k == 0)
            def _():
                start_fetch(jnp.int32(0), i, j)

            @pl.when(k + 1 < nbx * nby)
            def _():
                k1 = k + 1
                start_fetch(1 - islot, k1 // nby,
                            jax.lax.rem(k1, jnp.int32(nby)))

            fetch(islot, i, j, False)
            t = win[islot]
            # small axes first (shrink before the big lane matmul)
            t = self._contract(t, mxh_r[0], mxl_r[0], 0, out_w)
            t = self._contract(t, myh_r[0], myl_r[0], 1, out_w)
            t = self._contract(t, mzh_r[...], mzl_r[...], 2, Zo)
            if n_add:
                t = t + add_r[...]
            out_r[...] = t.astype(dtype)

        blk_out = (out_w, out_w, Zo)
        out_spec = pl.BlockSpec(blk_out, lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1,) + Mxh.shape[1:], lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + Mxl.shape[1:], lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + Myh.shape[1:], lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + Myl.shape[1:], lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        operands = [src, Mxh, Mxl, Myh, Myl, Mzh, Mzl]
        if n_add:
            operands.append(add)
            in_specs.append(out_spec)
        fn = pl.pallas_call(
            kernel,
            grid=(nbx, nby),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
            scratch_shapes=[
                pltpu.VMEM((2, win_w, win_w, Zi), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )
        return fn(*operands)

    # --- public surface (TrimmedTransfer-compatible) ----------------------
    def _pad_c(self, t):
        return jnp.pad(t, ((0, 1),) * t.ndim)

    def _trim_c(self, t):
        return t[tuple(slice(0, s - 1) for s in t.shape)]

    def restrict(self, f: jnp.ndarray) -> jnp.ndarray:
        c = self._run("restrict", f)
        return c if self.coarse_trimmed else self._pad_c(c)

    def prolongate(self, c: jnp.ndarray) -> jnp.ndarray:
        if not self.coarse_trimmed:
            c = self._trim_c(c)
        return self._run("prolongate", c)

    def prolongate_and_add(self, dst: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        """dst + P c fused into the prolongation kernel's output tiles."""
        if not self.coarse_trimmed:
            c = self._trim_c(c)
        return self._run("prolongate", c, add=dst)


# process-level memo of AOT compile-probe outcomes (the make_cheb2_auto /
# laplace_compile_ok twin): a Mosaic crash in the transfer kernel must
# degrade to the XLA transfer instead of killing the program — the r=6
# bench lost its round-4 first capture to exactly this (the 2026 compile
# helper's divisibility prover rejected the window starts)
_TRANSFER_OK_MEMO: dict = {}


def transfer_compile_ok(tr: "PallasTransfer") -> bool:
    if tr.interpret:
        return True  # interpret mode never reaches Mosaic — skip the memos
    key = (tr.shape_f, tr.shape_c, tr.bf, tr.bc, tr.win_r, tr.win_p,
           tr.coarse_trimmed)
    if key not in _TRANSFER_OK_MEMO:
        from ..utils import probe_cache

        hit = probe_cache.get("transfer_ok", key)
        if hit is None:
            hit = _transfer_compile_probe(tr)
            probe_cache.put("transfer_ok", key, hit)
        _TRANSFER_OK_MEMO[key] = hit
    return _TRANSFER_OK_MEMO[key]


def _transfer_compile_probe(tr: "PallasTransfer") -> bool:
    if tr.interpret:
        return True
    import sys

    f32 = jnp.float32
    sc = tr.shape_c if tr.coarse_trimmed else tuple(
        s + 1 for s in tr.shape_c)

    def prog(f, d, c):
        r = tr.restrict(f)
        pa = tr.prolongate_and_add(d, c)
        return r.ravel()[0] + pa.ravel()[0]

    args = (jax.ShapeDtypeStruct(tr.shape_f, f32),
            jax.ShapeDtypeStruct(tr.shape_f, f32),
            jax.ShapeDtypeStruct(sc, f32))
    try:
        jax.jit(prog).lower(*args).compile()
        return True
    except Exception as e:  # noqa: BLE001 — Mosaic crashes surface here
        print(
            f"pallas transfer compile probe failed for {tr.shape_f}->"
            f"{tr.shape_c}: {type(e).__name__}: "
            f"{str(e).splitlines()[0][:200] if str(e) else ''}; degrading "
            "to the XLA transfer", file=sys.stderr,
        )
        return False


def make_h_transfer_auto(coarse: FESpace, fine: FESpace, dtype,
                         fine_trimmed: bool, coarse_trimmed: bool):
    """Fused pallas h-transfer when the fine level runs the trimmed pallas
    pipeline, the pair is eligible AND its kernels compile on the current
    backend (AOT probe, memoized); the XLA Transfer otherwise (callers wrap
    the XLA fallback via solvers.vcycle.wire_trimmed)."""
    from .transfer import make_h_transfer

    if (fine_trimmed and dtype == jnp.float32
            and pallas_h_transfer_eligible(coarse, fine)):
        tr = make_pallas_h_transfer(
            coarse, fine, dtype, coarse_trimmed=coarse_trimmed
        )
        if transfer_compile_ok(tr):
            return tr
    return make_h_transfer(coarse, fine, dtype)


def pallas_h_transfer_eligible(coarse: FESpace, fine: FESpace,
                               bf: int = 16) -> bool:
    p = fine.degree
    nf = fine.mesh.cells_per_axis
    bc = bf // 2
    return (
        fine.dim == 3
        and coarse.degree == p
        and nf == 2 * coarse.mesh.cells_per_axis
        and (nf * p) % 128 == 0
        # the COARSE side's lane extent must also be a 128-multiple:
        # sub-128-lane pallas outputs crash Mosaic (r3 batch-10: the
        # r5<->r4 pair with Zc=64 killed the whole bench compile)
        and ((nf // 2) * p) % 128 == 0
        and nf % bf == 0
        and bf % 2 == 0
        and (bc * p) % 8 == 0
        and p <= PAD  # window halo must fit in the padded frame
    )


def make_pallas_h_transfer(
    coarse: FESpace,
    fine: FESpace,
    dtype=jnp.float32,
    bf: int = 16,
    coarse_trimmed: bool = True,
    interpret: bool = False,
) -> PallasTransfer:
    """Fused geometric transfer between pallas-eligible levels.

    ``bf``: fine cells per block edge (coarse block = bf/2 cells).  The
    1D matrices are identical per axis on the hyper-cube, so x and y share
    the same per-block matrix stacks.
    """
    if not (interpret or pallas_h_transfer_eligible(coarse, fine, bf)):
        raise ValueError("levels not eligible for the pallas h-transfer")
    p = fine.degree
    n_c = coarse.mesh.cells_per_axis
    M1 = h_prolongation_matrix_1d(p)
    w = _weights_1d(n_c, 2 * p) * fine.free_mask_1d()
    P = _axis_matrix_1d(M1, n_c, p, 2 * p, w, coarse.free_mask_1d())
    P_t = P[:-1, :-1]  # trimmed rep: global last planes dropped
    Nf, Nc = P_t.shape
    Zf, Zc = Nf, Nc

    bfx = bf * p  # fine rows per block
    bcx = (bf // 2) * p  # coarse rows per block
    nbf = Nf // bfx
    nbc = Nc // bcx
    # padded-frame windows: width = stride + 2*PAD, stride = input rows per
    # block (the halo p <= PAD lives in the padding / neighbouring strides)
    win_r = bcx * 2 + 2 * PAD  # fine window for a coarse out block
    win_p = bfx // 2 + 2 * PAD  # coarse window for a fine out block

    rmx = _window_blocks(P_t, nbc, bcx, win_r, transpose=True)
    pmx = _window_blocks(P_t, nbf, bfx, win_p, transpose=False)
    assert _check_cover(P_t, nbc, bcx, win_r, True), "restrict window too narrow"
    assert _check_cover(P_t, nbf, bfx, win_p, False), "prolongate window too narrow"

    rmh, rml = _hilo(rmx)
    pmh, pml = _hilo(pmx)
    rzh, rzl = _hilo(P_t.T)  # z restrict: [Zc, Zf]
    pzh, pzl = _hilo(P_t)  # z prolongate: [Zf, Zc]
    return PallasTransfer(
        dim=3,
        shape_f=(Nf, Nf, Zf),
        shape_c=(Nc, Nc, Zc),
        bf=bfx,
        bc=bcx,
        win_r=win_r,
        win_p=win_p,
        coarse_trimmed=coarse_trimmed,
        interpret=interpret,
        r_mats=(rmh, rml, rmh, rml, rzh, rzl),
        p_mats=(pmh, pml, pmh, pml, pzh, pzl),
    )
