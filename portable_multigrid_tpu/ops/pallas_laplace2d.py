"""Fused Pallas TPU kernel family for the 2D Laplace operator.

The reference's second driver (2D polynomial multigrid,
source/polynomial_multigrid/program.cc:434-459) previously ran pure XLA
paths here; this module gives it the same fused-kernel treatment as the 3D
family (ops/pallas_laplace.py), re-shaped for 2D TPU layout:

    A = Kx (x) My + Mx (x) Ky

  * the y axis IS the lane axis (up to n*p = 3584 lanes at r=9 — hugely
    lane-friendly), contracted with banded rolls against the MASKED global
    assembled 1D matrices (the 3D kernel's z-lane machinery, verbatim);
  * the x axis is the sublane axis, blocked into bx-cell slabs with
    PARTIAL block-local 1D assemblies; the single inter-block overlap row
    is resolved by a sequential-grid carry row (the 3D carry-plane scheme
    reduced to one plane);
  * input windows (bx*p + 1 rows) are fetched as the 8-aligned bx*p-row
    body plus the next 8 rows (zero-filled on the last block — the global
    last x plane is Dirichlet-masked, so the zero fill is exact), with DMA
    starts emitted as explicit ``8 * (...)`` products (the Mosaic
    dim-1-divisibility prover, CLAUDE.md round-4);
  * outputs are standard blocked BlockSpecs ((bx*p, Z) tiles) — no manual
    write-back DMA needed in 2D.

The full fused smoother surface of the 3D family is provided (modes
"apply", "residual1t", "residual3t", "cheb", "chebl", "chebd", "chebdl"),
so :class:`solvers.chebyshev.FusedChebyshev` drives 2D levels unchanged:
every Chebyshev recurrence step is ONE kernel launch, with the elementwise
updates riding the operator kernel's DMA streams.  There is no separate
bf16 MXU core: at 2D lane extents a dense [Z, Z] matmul does not fit VMEM,
and the banded VPU core is already the natural engine — the recurrence
r/d streams still ride HBM in bf16 (sdtype), upcast exactly in VMEM.

Eligibility: dim == 2, Cartesian uniform mesh, padded lanes n*p + zpad a
128-multiple >= 128, n % bx == 0, bx*p % 8 == 0.  Use make_laplace_auto
(ops/pallas_laplace.py) for the compile-probed fallback ladder.
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
from .laplace import assembled_1d_matrices, diagonal_1d_factors
from .pallas_laplace import _masked_z_matrices, lane_pad, to_bands


def pallas2d_eligible(space: FESpace, bx: int = 16,
                      zpad: int | None = None) -> bool:
    """2D twin of :func:`pallas_laplace.pallas_eligible`: the lane axis is
    y (n*p + zpad must be a 128-multiple >= 128), blocks tile x only."""
    if space.dim != 2:
        return False
    n, p = space.mesh.cells_per_axis, space.degree
    if zpad is None:
        lanes_ok = n * p + lane_pad(space) >= 128
    else:
        Z = n * p + zpad
        lanes_ok = Z >= 128 and Z % 128 == 0 and (zpad == 0 or zpad >= p)
    return lanes_ok and n % bx == 0 and (bx * p) % 8 == 0


@pytree_dataclass
class PallasLaplace2D:
    """2D fused operator: same pytree/API surface as PallasLaplaceOperator
    (apply/_run/mask1/dK1/dM1/inv_diag), dim == 2, banded core only."""

    dim: int = static_field(default=2)
    degree: int = static_field(default=1)
    n: tuple = static_field(default=())
    bx: int = static_field(default=16)
    interpret: bool = static_field(default=False)
    core: str = static_field(default="banded")
    # x-axis masking: "iota" (global ends Dirichlet) or "vector" (per-shard
    # mask window — reserved for sharded 2D slabs)
    xmask: str = static_field(default="iota")
    # y-lane zero padding (see pallas_laplace.lane_pad): kernel state
    # carries n1*p + zpad lanes, pad lanes identically zero
    zpad: int = static_field(default=0)
    bands: tuple = None  # (Kyb, Myb, Kxb, Mxb)
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
        return self._bc(self.mask1[0], 0) * self._bc(self.mask1[1], 1)

    @property
    def inv_diag(self):
        diag = (
            self._bc(self.dK1[0], 0) * self._bc(self.dM1[1], 1)
            + self._bc(self.dM1[0], 0) * self._bc(self.dK1[1], 1)
        )
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
            uk = jnp.pad(u, ((0, 0), (0, self.zpad - 1)))
        au = self._run("apply", uk)
        if self.zpad:
            au = au[:, : self.grid_shape[1] - 1]
        au = jnp.pad(au, ((0, 1), (0, 1)))
        m = self.mask
        return m * au + (1.0 - m) * u

    def _run(self, mode: str, u: jnp.ndarray, blocked_ins=(), scal=None,
             sdtype: str = "f32"):
        """Blocked carry-row kernel, 2D modes (semantics identical to the 3D
        family — ops/pallas_laplace.py PallasLaplaceOperator._run):

        * "apply":      outv = (M A M u) trimmed to (N0-1, Z); u full.
        * "residual1t": trimmed r0 = rhs - M A M u (restriction prep).
        * "residual3t": r0, d0 = r0/(theta diag), x0 = u + d0 in one pass.
        * "cheb"/"chebl"/"chebd"/"chebdl": fused Chebyshev recurrence steps
          on trimmed state (r' = r - M A M d; d' = c0 d + c1 r'/diag;
          x' = x + d'), with the first-step x==d and last-step dead-write
          eliminations of the 3D family.
        """
        p = self.degree
        n0, n1 = self.n
        N0 = n0 * p + 1
        bx = self.bx
        X, Z = bx * p + 1, n1 * p + self.zpad
        nbi = n0 // bx
        bxp = bx * p
        dtype = self.dtype
        udtype = u.dtype  # stencil-input storage (bf16 for the d stream)
        xmask_vec = self.xmask == "vector"

        if bxp % 8 != 0:
            raise ValueError("pallas 2D kernel requires bx*p % 8 == 0")

        n_facs = 0 if mode in ("apply", "residual1t") else 4
        n_scal = 0 if scal is None else 1
        n_bins = len(blocked_ins)
        n_xm = 1 if xmask_vec else 0
        sd = jnp.bfloat16 if sdtype == "bf16" else dtype
        out_dtypes = {"apply": (dtype,), "residual1t": (dtype,),
                      "residual3t": (sd, sd, dtype),
                      "cheb": (sd, sd, dtype), "chebl": (dtype,),
                      "chebd": (sd, sd, dtype), "chebdl": (dtype,)}[mode]
        n_outs = len(out_dtypes)

        def kernel(u_hbm, *refs):
            (Ay_r, By_r, Ax_r, Bx_r) = refs[:4]
            pos = 4
            fac_refs = refs[pos: pos + n_facs]
            pos += n_facs
            xm_r = refs[pos] if xmask_vec else None
            pos += n_xm
            scal_r = refs[pos] if n_scal else None
            pos += n_scal
            bin_refs = refs[pos: pos + n_bins]
            pos += n_bins
            out_refs = refs[pos: pos + n_outs]
            (slab, carry_x, sems) = refs[pos + n_outs:]
            i = pl.program_id(0)
            islot = jax.lax.rem(i, jnp.int32(2))

            # ---- double-buffered input: the window is the 8-aligned body
            # (bxp rows) plus the next 8 rows; starts are explicit 8*(...)
            # products (Mosaic sublane-divisibility prover).  The last
            # block's tail is zero-filled: for trimmed inputs those rows do
            # not exist; for the full-grid "apply" input the one real row
            # there is the global Dirichlet x plane, masked to zero anyway.
            b8 = bxp // 8

            def in_body(slot, ii):
                return pltpu.make_async_copy(
                    u_hbm.at[pl.ds(8 * (ii * b8), bxp), pl.ds(0, Z)],
                    slab.at[slot, 0:bxp, :], sems.at[slot],
                )

            def in_tail(slot, ii):
                return pltpu.make_async_copy(
                    u_hbm.at[pl.ds(8 * ((ii + 1) * b8), 8), pl.ds(0, Z)],
                    slab.at[slot, bxp: bxp + 8, :], sems.at[2 + slot],
                )

            def start_fetch(slot, ii):
                in_body(slot, ii).start()
                if nbi > 1:

                    @pl.when(ii < nbi - 1)
                    def _():
                        in_tail(slot, ii).start()

                @pl.when(ii == nbi - 1)
                def _():
                    slab[slot, bxp: bxp + 8, :] = jnp.zeros((8, Z), udtype)

            @pl.when(i == 0)
            def _():
                start_fetch(jnp.int32(0), i)

            @pl.when(i + 1 < nbi)
            def _():
                start_fetch(1 - islot, i + 1)

            in_body(islot, i).wait()
            if nbi > 1:

                @pl.when(i < nbi - 1)
                def _():
                    in_tail(islot, i).wait()

            if xmask_vec:
                mvx = xm_r[pl.ds(i * bxp, X), :]
            else:
                xi = jax.lax.broadcasted_iota(jnp.int32, (X, 1), 0)
                mvx = jnp.logical_and(
                    jnp.logical_or(i > 0, xi > 0),
                    jnp.logical_or(i < nbi - 1, xi < X - 1),
                ).astype(dtype)

            # y masking is folded into the banded y matrices (masked global
            # assembly, zero-embedded over the pad lanes); bf16 stencil
            # inputs promote to f32 here, so all arithmetic is exact f32
            um = slab[islot, :X, :] * mvx

            def banded(t, bands_ref, axis):
                L = t.shape[axis]
                acc = bands_ref[p] * t
                for o in range(1, p + 1):
                    acc += bands_ref[p + o] * pltpu.roll(t, L - o, axis=axis)
                    acc += bands_ref[p - o] * pltpu.roll(t, o, axis=axis)
                return acc

            def banded_pair(t, bandsA, bandsB, axis):
                L = t.shape[axis]
                accA = bandsA[p] * t
                accB = bandsB[p] * t
                for o in range(1, p + 1):
                    tl = pltpu.roll(t, L - o, axis=axis)
                    tr = pltpu.roll(t, o, axis=axis)
                    accA += bandsA[p + o] * tl + bandsA[p - o] * tr
                    accB += bandsB[p + o] * tl + bandsB[p - o] * tr
                return accA, accB

            b, a = banded_pair(um, By_r, Ay_r, 1)  # My u, Ky u
            raw = banded(b, Ax_r, 0) + banded(a, Bx_r, 0)

            # single carry row: block i's raw row X-1 is the partial
            # contribution to block i+1's row 0 (sequential grid)
            wbuf = jax.lax.rem(i, jnp.int32(2))
            rbuf = 1 - wbuf
            prev = carry_x[rbuf, 0:1, :]
            carry_x[wbuf, 0:1, :] = raw[X - 1: X, :]
            outv = raw[: X - 1, :]
            row0 = outv[:1, :] + jnp.where(
                i > 0, prev, jnp.zeros_like(prev)
            )
            outv = jnp.concatenate([row0, outv[1:, :]], axis=0)
            outv = outv * mvx[: X - 1]

            def put(ix, val):
                out_refs[ix][...] = val.astype(out_dtypes[ix])

            if mode == "apply":
                put(0, outv)
                return
            if mode == "residual1t":
                put(0, bin_refs[0][...] - outv)
                return

            # fused epilogues: diagonal rebuilt in-VMEM from 1D factors
            (xK_r, xM_r, yK_r, yM_r) = fac_refs
            xK = xK_r[pl.ds(i * bxp, bxp), :]
            xM = xM_r[pl.ds(i * bxp, bxp), :]
            diag = xK * yM_r[...] + xM * yK_r[...]

            if mode == "residual3t":
                rhs_blk = bin_refs[0][...]
                theta = scal_r[0, 0]
                r0 = rhs_blk - outv
                put(0, r0)
                d0 = r0 / (theta * diag)
                put(1, d0)
                put(2, slab[islot, 0:bxp, :].astype(dtype) + d0)
            else:  # "cheb" family
                d_blk = slab[islot, 0:bxp, :].astype(dtype)
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
                    put(0, x_blk + dn)
                else:
                    put(0, rn)
                    put(1, dn)
                    put(2, x_blk + dn)

        in_specs = [pl.BlockSpec(memory_space=pl.ANY)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
        ] * 4
        operands = list(self.bands)
        if n_facs:
            dKx, dKy = self.dK1
            dMx, dMy = self.dM1
            ydK = dKy[: n1 * p]
            ydM = dMy[: n1 * p]
            if self.zpad:
                # pad lanes hold 1.0 (state is zero there; 0 / diag needs a
                # finite nonzero diagonal)
                ydK = jnp.pad(ydK, (0, self.zpad), constant_values=1.0)
                ydM = jnp.pad(ydM, (0, self.zpad), constant_values=1.0)
            operands += [
                dKx[: N0 - 1].reshape(-1, 1),
                dMx[: N0 - 1].reshape(-1, 1),
                ydK.reshape(1, -1),
                ydM.reshape(1, -1),
            ]
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        if xmask_vec:
            operands.append(self.mask1[0].reshape(-1, 1))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if n_scal:
            operands.append(jnp.asarray(scal, jnp.float32).reshape(1, 2))
            in_specs.append(
                pl.BlockSpec((1, 2), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
            )
        blk_spec = pl.BlockSpec((bxp, Z), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        for b_in in blocked_ins:
            operands.append(b_in)
            in_specs.append(blk_spec)

        out_specs = (blk_spec,) * n_outs
        out_shape = tuple(
            jax.ShapeDtypeStruct((N0 - 1, Z), dt) for dt in out_dtypes
        )
        if mode == "apply":
            out_specs = out_specs[0]
            out_shape = out_shape[0]

        scratch = [
            pltpu.VMEM((2, bxp + 8, Z), udtype),
            pltpu.VMEM((2, 8, Z), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ]
        inner = pl.pallas_call(
            kernel,
            grid=(nbi,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )
        return inner(u, *operands)

    vmult = apply

    @property
    def m(self) -> int:
        return self.n_dofs

    def diagonal(self) -> jnp.ndarray:
        return 1.0 / self.inv_diag


def make_pallas_laplace2d(
    space: FESpace,
    dtype=jnp.float32,
    bx: int = 16,
    interpret: bool = False,
    zpad: int | None = None,
) -> PallasLaplace2D:
    """``zpad=None`` (default) pads y lanes per
    :func:`pallas_laplace.lane_pad`; an explicit value overrides it
    (interpret-mode tests exercise padding on tiny grids this way)."""
    if not (interpret or pallas2d_eligible(space, bx, zpad)):
        raise ValueError(
            "pallas 2D operator requires dim==2, padded lanes n*p + zpad a "
            "128-multiple >= 128 and an 8-aligned block window; use "
            "make_laplace_auto for fallback"
        )
    p = space.degree
    n = space.mesh.cells_per_axis
    if zpad is None:
        zpad = lane_pad(space)
    if zpad and zpad < p:
        raise ValueError(f"zpad {zpad} must be 0 or >= degree {p}")
    X, Z = bx * p + 1, n * p + zpad
    nb = 2 * p + 1
    K1, M1 = assembled_1d_matrices(space)
    m1 = space.free_mask_1d()

    b = make_basis(p)
    W = np.diag(b.q_weights)
    Kc = (b.D.T @ W @ b.D) / space.mesh.h
    Mc = (b.B.T @ W @ b.B) * space.mesh.h

    def local_1d(blk):
        # PARTIAL assembly over exactly blk cells (boundary rows carry only
        # the block's own contributions, completed by the carry row)
        w = blk * p + 1
        K = np.zeros((w, w))
        M = np.zeros((w, w))
        for c in range(blk):
            sl = slice(c * p, c * p + p + 1)
            K[sl, sl] += Kc
            M[sl, sl] += Mc
        return K, M

    Kym, Mym = _masked_z_matrices(K1, M1, m1, n * p, Z)
    Kxl, Mxl = local_1d(bx)
    bands = (
        to_bands(Kym, p).reshape(nb, 1, Z),
        to_bands(Mym, p).reshape(nb, 1, Z),
        to_bands(Kxl, p).reshape(nb, X, 1),
        to_bands(Mxl, p).reshape(nb, X, 1),
    )
    gK, gM = diagonal_1d_factors(space)
    return PallasLaplace2D(
        dim=space.dim,
        degree=p,
        n=(n,) * space.dim,
        bx=bx,
        interpret=interpret,
        zpad=zpad,
        bands=tuple(jnp.asarray(v, dtype) for v in bands),
        mask1=(jnp.asarray(m1, dtype),) * space.dim,
        dK1=(jnp.asarray(gK, dtype),) * space.dim,
        dM1=(jnp.asarray(gM, dtype),) * space.dim,
    )


# process-level memo of AOT compile-probe outcomes (disk-cached like the 3D
# family's laplace_compile_ok — utils/probe_cache.py)
_LAPLACE2D_OK_MEMO: dict = {}

# the one 2D operator serves every role: exact applies/residuals AND the
# fused recurrence (no separate MXU smoother core in 2D)
_ALL_MODES_2D = ("apply", "residual1t", "residual3t", "cheb", "chebl",
                 "chebd", "chebdl")


def laplace2d_compile_ok(op: "PallasLaplace2D",
                         modes: tuple = _ALL_MODES_2D,
                         sdtype: str = "bf16") -> bool:
    """AOT-compile every kernel mode in ONE jitted program on the current
    backend; False when the Mosaic compile crashes (the 2D crash envelope
    is unmapped — every candidate must be probed, CLAUDE.md round-4)."""
    if op.interpret:
        return True
    key = (op.n, op.degree, op.bx, op.zpad, op.xmask, sdtype, tuple(modes))
    if key not in _LAPLACE2D_OK_MEMO:
        from ..utils import probe_cache

        hit = probe_cache.get("laplace2d_ok", key)
        if hit is None:
            hit = _laplace2d_compile_probe(op, modes, sdtype)
            probe_cache.put("laplace2d_ok", key, hit)
        _LAPLACE2D_OK_MEMO[key] = hit
    return _LAPLACE2D_OK_MEMO[key]


def _laplace2d_compile_probe(op, modes, sdtype) -> bool:
    p = op.degree
    n0, n1 = op.n
    tshape = (n0 * p, n1 * p + op.zpad)
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
                outs = op._run("residual3t", ut, (rt,), scal2, sdtype=sdtype)
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
            f"pallas 2D compile probe failed: bx={op.bx} n={op.n} p={p} "
            f"zpad={op.zpad} modes={modes}: {type(e).__name__}: "
            f"{str(e)[:200]}; degrading", file=sys.stderr,
        )
        return False


def make_laplace2d_candidate(space: FESpace, dtype=jnp.float32):
    """Fastest compile-probed 2D Pallas operator, or None (fall back to the
    XLA variants).  Called from make_laplace_auto for dim == 2 spaces.

    Block-size candidates: bigger x blocks amortize the carry row and DMA
    fixed costs (fewer grid steps) but multiply the double-buffered VMEM
    footprint by Z — the declared-VMEM estimate filters, the compile probe
    catches register spills the estimate cannot see."""
    if dtype != jnp.float32:
        return None
    if jax.default_backend() == "cpu":
        # no Mosaic on CPU: the XLA block-banded variants are the CPU
        # engine; interpret-mode tests build the kernel explicitly
        return None
    p = space.degree
    n = space.mesh.cells_per_axis
    Z = n * p + lane_pad(space)
    for bx in (32, 16, 8, 4, 2, n):
        if bx > n:
            continue
        if not pallas2d_eligible(space, bx):
            continue
        bxp = bx * p
        est = 4 * (
            2 * (bxp + 8) * Z  # input slab (double-buffered)
            + 2 * 8 * Z  # carry rows
            # worst mode ("cheb"): 2 blocked ins + 3 blocked outs, each
            # double-buffered by the Pallas pipeline
            + 5 * 2 * bxp * Z
        ) + 4 * (4 * p + 2) * Z  # banded y matrices
        if est >= 110 * 1024 * 1024:
            continue
        op = make_pallas_laplace2d(space, dtype, bx=bx)
        if jax.default_backend() != "cpu" and not laplace2d_compile_ok(op):
            continue
        return op
    return None
