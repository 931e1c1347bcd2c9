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


def _window_blocks(P_t: np.ndarray, nb: int, out_w: int, win_w: int,
                   transpose: bool):
    """Per-block contraction matrices for a halo'd window read.

    Block b writes output rows [b*out_w, (b+1)*out_w) reading input window
    [start(b), start(b)+win_w) where start(b) = clamp(anchor - pad) rounded
    to the DMA alignment; the matrix slice absorbs clamping and alignment.
    Returns (starts [nb] int32, mats [nb, out_w, win_w]).

    ``transpose=False``: prolongation, out = fine rows, in = coarse window,
    mats[b] = P_t[out_rows, win].  ``transpose=True``: restriction,
    out = coarse rows, in = fine window, mats[b] = P_t[win, out_rows]^T.
    """
    N_out, N_in = (P_t.shape[1], P_t.shape[0]) if transpose else P_t.shape
    ratio = N_in / N_out
    starts = np.zeros(nb, np.int32)
    mats = np.zeros((nb, out_w, win_w), P_t.dtype)
    for b in range(nb):
        anchor = int(round(b * out_w * ratio))
        s = max(0, min(((anchor - 8) // 8) * 8, N_in - win_w))
        starts[b] = s
        rows = slice(b * out_w, (b + 1) * out_w)
        win = slice(s, s + win_w)
        blk = P_t[win, rows].T if transpose else P_t[rows, win]
        mats[b] = blk
    return starts, mats


def _check_cover(P_t: np.ndarray, nb: int, out_w: int, win_w: int,
                 transpose: bool) -> bool:
    """True iff every nonzero of P_t lands inside some block's window."""
    starts, _ = _window_blocks(P_t, nb, out_w, win_w, transpose)
    A = P_t.T if transpose else P_t
    for b in range(nb):
        rows = A[b * out_w: (b + 1) * out_w]
        nz = np.nonzero(np.any(rows != 0.0, axis=0))[0]
        if nz.size and (nz.min() < starts[b] or nz.max() >= starts[b] + win_w):
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
    # restrict operands: per-block x/y matrices + starts, full z matrix
    r_starts: tuple = None  # (sx [nbx], sy [nby]) int32
    r_mats: tuple = None  # (Mx hi/lo [nbx,bc,win_r], My hi/lo, Mz hi/lo)
    p_starts: tuple = None
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
        # window starts are pure program-id arithmetic (same clamped formula
        # as the host-side _window_blocks, so the per-block matrices match);
        # SMEM-sourced DMA starts crash the Mosaic compiler (r3 batch-6)
        anchor = out_w * 2 if restrict else out_w // 2

        def start(idx, n_in):
            s = ((idx * anchor - 8) // 8) * 8
            return jnp.maximum(0, jnp.minimum(s, n_in - win_w))

        def kernel(src_hbm, mxh_r, mxl_r, myh_r, myl_r,
                   mzh_r, mzl_r, *rest):
            if n_add:
                add_r = rest[0]
            out_r = rest[n_add]
            win, sem = rest[n_add + 1:]
            i = pl.program_id(0)
            j = pl.program_id(1)
            x0 = start(i, in_shape[0])
            y0 = start(j, in_shape[1])
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(x0, win_w), pl.ds(y0, win_w), pl.ds(0, Zi)],
                win, sem,
            )
            cp.start()
            cp.wait()
            t = win[...]
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
                pltpu.VMEM((win_w, win_w, Zi), dtype),
                pltpu.SemaphoreType.DMA,
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


def make_h_transfer_auto(coarse: FESpace, fine: FESpace, dtype,
                         fine_trimmed: bool, coarse_trimmed: bool):
    """Fused pallas h-transfer when the fine level runs the trimmed pallas
    pipeline and the pair is eligible; the XLA Transfer otherwise (callers
    wrap the XLA fallback via solvers.vcycle.wire_trimmed)."""
    from .transfer import make_h_transfer

    if (fine_trimmed and dtype == jnp.float32
            and pallas_h_transfer_eligible(coarse, fine)):
        return make_pallas_h_transfer(
            coarse, fine, dtype, coarse_trimmed=coarse_trimmed
        )
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
        and nf % bf == 0
        and bf % 2 == 0
        and (bc * p) % 8 == 0
        # halo'd windows must fit inside the (trimmed) grids
        and (bc * p) * 2 + 16 <= nf * p
        and (bf * p) // 2 + 16 <= (nf // 2) * p
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
    # windows: halo p (+8 alignment slack), widths multiples of 8, clamped
    # to the axis extent (tiny grids read the whole axis)
    win_r = min(bcx * 2 + 16, Nf)  # fine window for a coarse out block
    win_p = min(bfx // 2 + 16, Nc)  # coarse window for a fine out block

    rsx, rmx = _window_blocks(P_t, nbc, bcx, win_r, transpose=True)
    psx, pmx = _window_blocks(P_t, nbf, bfx, win_p, transpose=False)
    assert _check_cover(P_t, nbc, bcx, win_r, True), "restrict window too narrow"
    assert _check_cover(P_t, nbf, bfx, win_p, False), "prolongate window too narrow"

    rmh, rml = _hilo(rmx)
    pmh, pml = _hilo(pmx)
    rzh, rzl = _hilo(P_t.T)  # z restrict: [Zc, Zf]
    pzh, pzl = _hilo(P_t)  # z prolongate: [Zf, Zc]
    sx = jnp.asarray(rsx)
    px = jnp.asarray(psx)
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
        r_starts=(sx, sx),
        r_mats=(rmh, rml, rmh, rml, rzh, rzl),
        p_starts=(px, px),
        p_mats=(pmh, pml, pmh, pml, pzh, pzl),
    )
