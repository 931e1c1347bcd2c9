"""Coarse-tail mega-kernel: the ENTIRE sub-V-cycle below a given level as
ONE Pallas program resident in VMEM.

At the coarse end of the hierarchy (grids of 5^3..65^3, <= ~1 MB each) the
XLA composition is launch-bound: hundreds of micro-kernels (kron
contractions, Chebyshev axpys, transfer windows) each cost more to launch
than to execute, adding up to ~5 ms of a 30 ms r=6 V-cycle (PERFORMANCE.md
round-2 budget).  All of that state fits in VMEM simultaneously, so this
kernel traces the whole recursion — levels, smoothers, transfers — into one
Mosaic program: ONE launch, one HBM read (the coarsest sharded level's
restricted residual), one HBM write (its correction).

Algebra per level (bit-matching the XLA path it replaces):
  * operator: masked-Kronecker A_eff u = M A M u + (I - M) u with
    mask-folded assembled 1D matrices (ops/laplace.py kron variant);
  * smoother: the standard three-term Chebyshev recurrence
    (solvers/chebyshev.py:Chebyshev.apply), inverse diagonal passed in as a
    precomputed 3D operand;
  * transfers: dense per-axis 1D matrices with weights and Dirichlet masks
    folded in (ops/pallas_transfer.py:_axis_matrix_1d);
  * recursion: identical structure to solvers/vcycle.py:VCycle._cycle
    including the first-pre-smooth-on-zero-guess shortcut and the
    Chebyshev-as-solver coarsest level (reference:
    include/multigrid/portable_v_cycle_multigrid.h:128-190).

Contractions run at Precision.HIGHEST (f32-faithful multi-pass MXU) — the
same grade as the XLA kron path's "high"; the convergence-count tests pin
the equivalence.

IO convention: trimmed state on the top level (the fused pipeline's native
representation), padded/sliced inside the kernel.

STATUS (round 4): superseded as the production coarse-tail lever.  The
mega-kernel never compiled on real Mosaic (register-spill OOM at 64-extent
tops; interpret-mode only, PMG_BENCH_MEGA_COARSE=1 to probe) — the lever it
targeted was instead claimed by zpad-up (ops/pallas_laplace.py:lane_pad,
the TPU default): padding sub-128-lane coarse levels to one 128-lane tile
lets every coarse level ride the standard fused kernel family, measured
r=5 sub-cycle 3.72 -> 0.465 ms (experiments/r4_batch4.py).  Kept as a
tested reference implementation of whole-recursion-in-VMEM.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fem.basis import h_prolongation_matrix_1d
from ..fem.space import FESpace
from ..ops.laplace import assembled_1d_matrices, make_laplace
from ..utils.pytree import pytree_dataclass, static_field
from .pallas_transfer import _axis_matrix_1d
from .transfer import _weights_1d


@pytree_dataclass
class CoarseCycleKernel:
    """levels[0] (coarsest) .. levels[-1] (the kernel's top level); presents
    the V-cycle coarse-solver surface (``apply``) on the TOP level, trimmed.
    """

    shapes: tuple = static_field()  # per-level PADDED x/y in-kernel extent
    # per-level PADDED lane (z) extent: bf16 x-pattern dots need >= 128
    # lanes while x/y extents compile from 32 (r3 batch-12 bisection), so
    # padding is anisotropic and the z axis carries its own matrices
    shapes_z: tuple = static_field(default=())
    degrees: tuple = static_field(default=())  # Chebyshev degree per level
    top_trim: int = static_field(default=0)  # true trimmed top-level extent
    pre: int = static_field(default=2)
    post: int = static_field(default=2)
    # in-kernel dot precision: "highest" (f32-faithful multi-pass) is the
    # production grade; "default" exists for Mosaic-crash bisection
    precision: str = static_field(default="highest")
    interpret: bool = static_field(default=False)
    K1m: tuple = None  # per-level [Nxy, Nxy] mask-folded 1D stiffness (x/y)
    M1m: tuple = None
    K1mz: tuple = None  # per-level [Nz, Nz] z-axis (lane-padded) variants
    M1mz: tuple = None
    inv_diag3: tuple = None  # per-level [Nxy, Nxy, Nz]
    mask3: tuple = None  # per-level [Nxy, Nxy, Nz]
    P1: tuple = None  # per-PAIR [Nf, Nc] weights+masks-folded prolongation
    # host-side transposes of P1: restriction contracts with these through
    # the SAME dot patterns as prolongation — Mosaic crashes on the
    # transposed-contraction dimension numbers (r3 batch-9)
    P1T: tuple = None
    P1z: tuple = None  # z-axis (lane-padded) transfer matrices
    P1zT: tuple = None
    scal: jnp.ndarray = None  # [L, 2] (theta, delta) per level

    @property
    def n_levels(self):
        return len(self.shapes)

    def apply(self, src: jnp.ndarray) -> jnp.ndarray:
        """Coarse-solver vmult on the TRIMMED top-level grid."""
        Nt = self.shapes[-1]
        Nz = self.shapes_z[-1]
        top = self.top_trim or Nt
        if top == Nt and top == Nz:
            return self._apply_padded(src)
        # top level below the in-kernel padding floors: convert
        # representation outside the kernel (tiny XLA pad/slice)
        out = self._apply_padded(jnp.pad(
            src, ((0, Nt - top), (0, Nt - top), (0, Nz - top))))
        return out[:top, :top, :top]

    def _apply_padded(self, src: jnp.ndarray) -> jnp.ndarray:
        L = self.n_levels
        Nt = self.shapes[-1]
        dtype = src.dtype
        bf16 = jnp.bfloat16

        # hi/lo-split bf16 contractions (~1e-7 relative, the mxu3 scheme) —
        # f32 dots with non-default precision crash Mosaic for the x
        # pattern at ANY size (r3 batch-7/8 bisection), while bf16 dots
        # with f32 accumulation compile; this matches the XLA kron path's
        # "high" precision grade
        # interpret mode (CPU) cannot execute bf16 x bf16 dots ("DotThunk"
        # limitation): run the same bf16-ROUNDED values through f32 dots —
        # identical products, f32 accumulation either way
        up = ((lambda v: v.astype(jnp.float32)) if self.interpret
              else (lambda v: v))

        def hilo3(d, t, w):
            thi = t.astype(bf16)
            tlo = (t - thi.astype(jnp.float32)).astype(bf16)
            whi = w.astype(bf16)
            wlo = (w - whi.astype(jnp.float32)).astype(bf16)
            return (d(up(thi), up(whi)) + d(up(tlo), up(whi))
                    + d(up(thi), up(wlo)))

        def ctr(t, W, axis):
            """out[..., i, ...] = sum_k W[i, k] t[..., k, ...]."""
            if axis == 2:
                def d(a, w):
                    return jax.lax.dot_general(
                        a, w, (((2,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
            elif axis == 0:
                def d(a, w):
                    return jax.lax.dot_general(
                        w, a, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            else:
                # axis 1: batched over x rows (no 3D transposes in Mosaic)
                def d(a, w):
                    w3 = jnp.broadcast_to(w[None], (a.shape[0],) + w.shape)
                    return jax.lax.dot_general(
                        w3, a, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)

            return hilo3(d, t, W)

        def kernel(src_r, *refs):
            pos = 0

            def take(n):
                nonlocal pos
                out = refs[pos: pos + n]
                pos += n
                return out

            K_r = take(L)
            M_r = take(L)
            Kz_r = take(L)
            Mz_r = take(L)
            idg_r = take(L)
            msk_r = take(L)
            P_r = take(L - 1)
            PT_r = take(L - 1)
            Pz_r = take(L - 1)
            PzT_r = take(L - 1)
            scal_r = take(1)[0]
            out_r = take(1)[0]

            def apply_op(l, u):
                m = msk_r[l][...]
                um = u * m
                K = K_r[l][...]
                M = M_r[l][...]
                b = ctr(um, Mz_r[l][...], 2)
                a = ctr(um, Kz_r[l][...], 2)
                mb = ctr(b, M, 1)
                kb = ctr(b, K, 1)
                ma = ctr(a, M, 1)
                raw = ctr(mb, K, 0) + ctr(kb + ma, M, 0)
                return raw + (1.0 - m) * u

            def cheb(l, b):
                """Chebyshev preconditioner vmult, x0 = 0
                (solvers/chebyshev.py:Chebyshev.apply)."""
                theta = scal_r[l, 0]
                delta = scal_r[l, 1]
                idg = idg_r[l][...]
                sigma1 = theta / delta
                rho = 1.0 / sigma1
                d = (idg * b) / theta
                x = d
                r = b
                for _ in range(1, self.degrees[l]):
                    r = r - apply_op(l, d)
                    rho_new = 1.0 / (2.0 * sigma1 - rho)
                    d = (rho_new * rho) * d + (2.0 * rho_new / delta) * (
                        idg * r
                    )
                    x = x + d
                    rho = rho_new
                return x

            def restrict(l, f):
                PT = PT_r[l - 1][...]
                t = ctr(f, PT, 0)
                t = ctr(t, PT, 1)
                return ctr(t, PzT_r[l - 1][...], 2)

            def prolongate(l, c):
                P = P_r[l - 1][...]
                t = ctr(c, P, 0)
                t = ctr(t, P, 1)
                return ctr(t, Pz_r[l - 1][...], 2)

            def cycle(l, src):
                if l == 0:
                    return cheb(0, src)
                u = cheb(l, src)  # first pre-smooth on the zero guess
                for _ in range(self.pre - 1):
                    u = u + cheb(l, src - apply_op(l, u))
                residual = src - apply_op(l, u)
                cc = cycle(l - 1, restrict(l, residual))
                u = u + prolongate(l, cc)
                for _ in range(self.post):
                    u = u + cheb(l, src - apply_op(l, u))
                return u

            # everything runs TRIMMED in-kernel: the global last planes are
            # Dirichlet (masked rows/cols of every matrix are zero), so
            # dropping them is exact — and it avoids in-kernel pads (no
            # Mosaic pad op) and keeps every extent a power of two
            out_r[...] = cycle(L - 1, src_r[...])

        operands = (list(self.K1m) + list(self.M1m) + list(self.K1mz)
                    + list(self.M1mz) + list(self.inv_diag3)
                    + list(self.mask3) + list(self.P1) + list(self.P1T)
                    + list(self.P1z) + list(self.P1zT) + [self.scal])
        fn = pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * len(operands)
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (Nt, Nt, self.shapes_z[-1]), dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )
        return fn(src, *operands)


@pytree_dataclass
class CoarseCycleSmoother:
    """Adapter presenting CoarseCycleKernel as a level-0 'smoother': the
    V-cycle's coarsest-level solve IS one kernel launch.  trimmed_io marks
    the level for solvers.vcycle.wire_trimmed."""

    trimmed_io: bool = static_field(default=True)
    kern: CoarseCycleKernel = None

    def apply(self, src: jnp.ndarray) -> jnp.ndarray:
        return self.kern.apply(src)


def make_coarse_cycle(
    spaces: list[FESpace],
    dtype=jnp.float32,
    *,
    smoothing_range: float = 15.0,
    degree: int | None = 5,
    eig_cg_n_iterations: int = 10,
    min_xy: int = 32,
    min_z: int = 128,
    interpret: bool = False,
) -> CoarseCycleKernel:
    """Build the mega-kernel for the hierarchy tail ``spaces`` (coarsest
    first).  Smoother setup (eig-CG bounds, reference rules) runs per level
    exactly as the XLA composition would (models/poisson.py:_build_level);
    the coarsest level uses Chebyshev-as-solver
    (reference: source/geometric_multigrid/program.cc:274-279)."""
    from ..solvers.chebyshev import make_chebyshev

    K1m, M1m, K1mz, M1mz, idg3, msk3 = [], [], [], [], [], []
    P1, P1T, P1z, P1zT = [], [], [], []
    scal = np.zeros((len(spaces), 2), np.float32)
    degrees = []
    for l, sp in enumerate(spaces):
        if sp.dim != 3:
            raise ValueError("coarse mega-kernel is 3D-only")
        K1, M1 = assembled_1d_matrices(sp)
        m1 = sp.free_mask_1d()
        # TRIMMED operands (global last planes are Dirichlet: masked matrix
        # rows/cols are zero, so the slice is exact), zero-PADDED
        # anisotropically — bf16 x-pattern dots need >= 128 LANES while
        # x/y extents compile from 32 (r3 batch-12); the padded region is
        # exactly zero-preserved (zero matrix rows/cols, mask 0, unit diag)
        Nt0 = sp.grid_shape[0] - 1
        Np = max(Nt0, min_xy)
        Nz = max(Nt0, min_z)

        def pad2(a, n, fill=0.0):
            out = np.full((n, n), fill)
            out[: a.shape[0], : a.shape[1]] = a
            return out

        def pad3(a, fill=0.0):
            out = np.full((Np, Np, Nz), fill)
            out[: a.shape[0], : a.shape[1], : a.shape[2]] = a
            return out

        K1t = (m1[:, None] * K1 * m1[None, :])[:-1, :-1]
        M1t = (m1[:, None] * M1 * m1[None, :])[:-1, :-1]
        K1m.append(jnp.asarray(pad2(K1t, Np), dtype))
        M1m.append(jnp.asarray(pad2(M1t, Np), dtype))
        K1mz.append(jnp.asarray(pad2(K1t, Nz), dtype))
        M1mz.append(jnp.asarray(pad2(M1t, Nz), dtype))
        op = make_laplace(sp, dtype, variant="kron")
        idg3.append(jnp.asarray(
            pad3(np.asarray(op.inv_diag)[:-1, :-1, :-1], fill=1.0), dtype))
        msk3.append(jnp.asarray(
            pad3(np.asarray(op.mask)[:-1, :-1, :-1]), dtype))
        if l == 0:
            sm = make_chebyshev(
                op, smoothing_range=1e-3, degree=None,
                eig_cg_n_iterations=sp.n_dofs,
            )
        else:
            sm = make_chebyshev(
                op, smoothing_range=smoothing_range, degree=degree,
                eig_cg_n_iterations=eig_cg_n_iterations,
            )
        degrees.append(sm.degree)
        scal[l, 0] = float(sm.theta)
        scal[l, 1] = float(sm.delta)
        if l > 0:
            c = spaces[l - 1]
            p = sp.degree
            if c.degree != p or sp.mesh.cells_per_axis != 2 * c.mesh.cells_per_axis:
                raise ValueError("coarse tail must be a geometric h-sequence")
            M1p = h_prolongation_matrix_1d(p)
            w = _weights_1d(c.mesh.cells_per_axis, 2 * p) * sp.free_mask_1d()
            P = _axis_matrix_1d(M1p, c.mesh.cells_per_axis, p, 2 * p, w,
                                c.free_mask_1d())
            Pt = P[:-1, :-1]
            Nc0 = c.grid_shape[0] - 1

            def padP(nf, nc):
                out = np.zeros((nf, nc))
                out[: Pt.shape[0], : Pt.shape[1]] = Pt
                return out

            P1.append(jnp.asarray(padP(Np, max(Nc0, min_xy)), dtype))
            P1T.append(jnp.asarray(
                np.ascontiguousarray(padP(Np, max(Nc0, min_xy)).T), dtype))
            P1z.append(jnp.asarray(padP(Nz, max(Nc0, min_z)), dtype))
            P1zT.append(jnp.asarray(
                np.ascontiguousarray(padP(Nz, max(Nc0, min_z)).T), dtype))
    return CoarseCycleKernel(
        shapes=tuple(max(sp.grid_shape[0] - 1, min_xy) for sp in spaces),
        shapes_z=tuple(max(sp.grid_shape[0] - 1, min_z) for sp in spaces),
        top_trim=spaces[-1].grid_shape[0] - 1,
        degrees=tuple(degrees),
        interpret=interpret,
        K1m=tuple(K1m),
        M1m=tuple(M1m),
        K1mz=tuple(K1mz),
        M1mz=tuple(M1mz),
        inv_diag3=tuple(idg3),
        mask3=tuple(msk3),
        P1=tuple(P1),
        P1T=tuple(P1T),
        P1z=tuple(P1z),
        P1zT=tuple(P1zT),
        scal=jnp.asarray(scal),
    )
