"""Chebyshev smoother with CG-Lanczos eigenvalue estimation.

TPU-native replacement for deal.II's ``PreconditionChebyshev`` exactly as the
reference configures it (reference: source/geometric_multigrid/program.cc:259-287):

  * smoothing levels: smoothing_range 15, polynomial degree 5,
    10 CG iterations for the eigenvalue estimate;
  * coarsest level, "Chebyshev as solver": smoothing_range 1e-3, adaptive
    degree, eig_cg_n_iterations = m() (reference:
    source/geometric_multigrid/program.cc:274-279 and the comment at
    include/multigrid/portable_v_cycle_multigrid.h:150-151).

The eigenvalue-bound and adaptive-degree rules follow the published deal.II
algorithm (documented in the deal.II manual for PreconditionChebyshev):

  beta  = 1.2 * max_eigenvalue_estimate
  alpha = max_eig / smoothing_range              if smoothing_range > 1
        = min(0.9 * max_eig, min_eig_estimate)   otherwise
  adaptive degree = 1 + log(1/eps + sqrt(1/eps^2 - 1)) / log(1/sigma),
      sigma = (1 - sqrt(alpha/beta)) / (1 + sqrt(alpha/beta)), eps = range.

The eigenvalue estimate runs preconditioned CG and takes the extreme
eigenvalues of the Lanczos tridiagonal built from the CG coefficients
(alpha_k, beta_k):  T_kk = 1/alpha_k + beta_{k-1}/alpha_{k-1},
T_{k,k+1} = sqrt(beta_k)/alpha_k.  Deviation from deal.II: the initial vector
is a deterministic hash-based pseudo-random vector restricted to free DoFs
(deal.II uses its own deterministic "high-frequency" fill); both choices give
Lanczos estimates of the same extreme eigenvalues.

The smoother application is the standard three-term Chebyshev recurrence
(Saad, "Iterative Methods for Sparse Linear Systems", Alg. 12.1) applied to
the Jacobi-preconditioned operator; polynomial degree d costs d-1 operator
applications plus d diagonal scalings, matching deal.II's cost model
("degree 1 = damped Jacobi").
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Chebyshev:
    """Chebyshev polynomial preconditioner/smoother of a fixed degree.

    ``op`` is any pytree with an ``apply`` method (the level operator);
    ``inv_diag`` is the inverse matrix diagonal (the Jacobi preconditioner,
    reference: source/geometric_multigrid/program.cc:281-283).
    """

    degree: int = static_field()
    op: object = None
    # None = derive from op.inv_diag at trace time (keeps huge grids out of
    # the smoother pytree; the operator stores separable 1D factors)
    inv_diag: jnp.ndarray = None
    theta: jnp.ndarray = None  # (beta + alpha) / 2
    delta: jnp.ndarray = None  # (beta - alpha) / 2

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        """Return p(P^-1 A) P^-1 b — the preconditioner vmult with x0 = 0."""
        inv_diag = self.inv_diag if self.inv_diag is not None else self.op.inv_diag
        sigma1 = self.theta / self.delta
        rho = 1.0 / sigma1
        d = (inv_diag * b) / self.theta
        x = d
        r = b
        for _ in range(1, self.degree):
            r = r - self.op.apply(d)
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            d = (rho_new * rho) * d + (2.0 * rho_new / self.delta) * (
                inv_diag * r
            )
            x = x + d
            rho = rho_new
        return x


@pytree_dataclass
class FusedChebyshev:
    """Chebyshev smoother with the recurrence fused into the Pallas kernel.

    Mathematically identical to :class:`Chebyshev` restricted to the free
    DoFs: state lives TRIMMED (the global last planes dropped) and
    constrained entries are identically zero — valid inside the production
    solver, where every residual entering a smoother is masked (CG/V-cycle
    never produce nonzero constrained residuals).  Each recurrence step is
    ONE kernel launch computing r' = r - M A M d, d' = c0 d + c1 r'/diag,
    x' = x + d' with the elementwise updates riding the operator kernel's
    DMA streams (3 reads + 3 writes vs 9+ HBM passes unfused).

    ``op`` is the exact (banded) operator used for the residual half-step in
    :meth:`smooth`; ``op_smooth`` is the bf16 MXU-core operator driving the
    recurrence (convergence-count preservation: tests/test_pallas_smoother).
    """

    degree: int = static_field()
    # "unroll" (default) lets XLA schedule across recurrence steps; "scan"
    # emits the fused-step kernel once per smoother, shrinking program size,
    # but its carry copies cost ~2x per smoothing step (7.1 vs 3.6 ms
    # measured at r=6) — keep it only as an escape hatch for compile-size
    # limits
    steps_mode: str = static_field(default="unroll")
    # trimmed_io=True: apply/smooth/residual consume AND produce trimmed
    # state ((N0-1, N1-1, Z), constrained entries zero) so whole V-cycle
    # levels chain kernel-to-kernel with no pad/trim/add XLA passes; the
    # smoothing step seeds the recurrence accumulator with u inside the
    # residual kernel (mode "residual3t").  The V-cycle wires trimmed levels
    # through TrimmedTransfer (ops/transfer.py) and pads once at the top.
    trimmed_io: bool = static_field(default=False)
    op: object = None
    op_smooth: object = None
    # optional block-size twin of ``op`` for the 3-output residual3t kernel:
    # Mosaic cannot compile the banded core with 3 blocked outputs at 16x16
    # blocks / 256 lanes (r3 batch-2 bisection), while apply/residual1t are
    # fastest there — so smooth() may route its residual half-step through a
    # smaller-block twin.  None = use ``op``.
    op_resid3: object = None
    # "bf16": store the recurrence r/d streams in bfloat16 (halves the
    # smoother's HBM traffic on those streams; the x accumulator and every
    # level residual stay f32, and all in-VMEM arithmetic is f32).  The mxu
    # recurrence core rounds d to bf16 for its matmuls anyway, so A·d loses
    # nothing; rounding the stored r perturbs the recurrence only at
    # recurrence-state scale — iteration-count parity is pinned by
    # tests/test_pallas_smoother.py.
    state_dtype: str = static_field(default="f32")
    # optional two-step fused kernel (ops/pallas_cheb2.py): consecutive
    # recurrence steps run in PAIRS, one HBM pass per pair (halo-extended
    # windows + redundant edge compute instead of carry planes).  The
    # in-VMEM intermediate state is f32 regardless of state_dtype, so a
    # paired recurrence is numerically at least as accurate as single steps.
    op_cheb2: object = None
    # optional S=3 "pair + r_out" kernel (rout=True Cheb2Kernel): the
    # V-cycle's pre-restriction residual rides the recurrence's final pair
    # (mode "cheb2lr"), killing the separate residual1t HBM pass — see
    # smooth_and_residual().  The residual is formed INCREMENTALLY
    # (r_out = r_n - A d_n at recurrence-state scale), never by the
    # operator-norm-scale cancellation that makes naive bf16 residuals
    # unusable (CLAUDE.md round-2 lesson); CG-count parity is pinned by
    # tests/test_pallas_cheb2.py.
    op_cheb2r: object = None
    theta: jnp.ndarray = None
    delta: jnp.ndarray = None

    @property
    def inv_diag(self):
        return self.op.inv_diag

    def _steps(self, r, d, x, x_is_d: bool = False, k0: int = 0,
               rho=None):
        sigma1 = self.theta / self.delta
        sdt = self.state_dtype
        if sdt == "bf16":
            # recurrence-state streams ride HBM in bf16 (see state_dtype);
            # entry state from the residual3t kernel is already bf16 — this
            # cast only matters for the f32 apply()/non-trimmed entries
            r = r.astype(jnp.bfloat16)
            d = d.astype(jnp.bfloat16)

        def step(carry, _):
            r, d, x, rho = carry
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            scal = jnp.stack(
                [rho_new * rho, 2.0 * rho_new / self.delta]
            ).astype(jnp.float32)
            r, d, x = self.op_smooth._run("cheb", d, (r, x), scal, sdtype=sdt)
            return (r, d, x, rho_new), None

        carry = (r, d, x, 1.0 / sigma1)
        if self.steps_mode == "unroll":
            # unrolled: the first step may skip the duplicate x(==d) read
            # and the LAST step skips the dead r'/d' writes — fewer full
            # HBM streams (modes chebd/chebl/chebdl).  With op_cheb2 set,
            # consecutive steps are consumed in PAIRS through the two-step
            # fused kernel (one HBM pass per pair).
            n = self.degree - 1
            if rho is None:
                rho = 1.0 / sigma1
            k = k0
            while k < n:
                rho_new = 1.0 / (2.0 * sigma1 - rho)
                c0a = rho_new * rho
                c1a = 2.0 * rho_new / self.delta
                first_d = x_is_d and k == 0
                if self.op_cheb2 is not None and k + 1 < n:
                    rho2 = 1.0 / (2.0 * sigma1 - rho_new)
                    scal = jnp.stack(
                        [c0a, c1a, rho2 * rho_new, 2.0 * rho2 / self.delta]
                    ).astype(jnp.float32)
                    last = k + 2 == n
                    mode = {(False, False): "cheb2", (False, True): "cheb2l",
                            (True, False): "chebd2", (True, True): "chebd2l"
                            }[(first_d, last)]
                    outs = self.op_cheb2.steps2(
                        d, r, None if first_d else x, scal, mode,
                        sdtype=sdt,
                    )
                    if last:
                        return outs[0]
                    r, d, x = outs
                    rho = rho2
                    k += 2
                    continue
                scal = jnp.stack([c0a, c1a]).astype(jnp.float32)
                last = k == n - 1
                mode = {(False, False): "cheb", (False, True): "chebl",
                        (True, False): "chebd", (True, True): "chebdl"}[
                    (first_d, last)]
                bins = (r,) if first_d else (r, x)
                outs = self.op_smooth._run(mode, d, bins, scal, sdtype=sdt)
                if last:
                    return outs[0]  # only x' is written on the last step
                r, d, x = outs
                rho = rho_new
                k += 1
            return x
        carry, _ = jax.lax.scan(
            step, carry, None, length=self.degree - 1
        )
        return carry[2]

    @property
    def _zpad(self):
        # lane-padded operators (ops/pallas_laplace.py lane_pad): trimmed
        # state carries n2*p + zpad z lanes, pad lanes identically zero
        return getattr(self.op, "zpad", 0)

    def _trim(self, b):
        """Full grid -> trimmed (lane-padded) state, any dim (the lane axis
        is the LAST grid axis: z in 3D, y in 2D)."""
        g = self.op.grid_shape
        bt = b.reshape(g)[tuple(slice(0, s - 1) for s in g)]
        if self._zpad:
            pad = [(0, 0)] * (len(g) - 1) + [(0, self._zpad)]
            bt = jnp.pad(bt, pad)
        return bt

    def _pad_full(self, t):
        """Trimmed (possibly lane-padded) state -> zero-padded full grid."""
        if self._zpad:
            t = t[..., : self.op.grid_shape[-1] - 1]
        return jnp.pad(t, ((0, 1),) * t.ndim)

    def _diag_trimmed(self):
        op = self.op
        dK, dM = op.dK1, op.dM1
        g = op.grid_shape
        dim = len(g)

        def x(v, d):
            v = v[: g[d] - 1]
            if d == dim - 1 and self._zpad:
                # pad lanes hold 1.0 (state is zero there; 0/1 stays zero)
                v = jnp.pad(v, (0, self._zpad), constant_values=1.0)
            return v.reshape([-1 if a == d else 1 for a in range(dim)])

        total = None
        for k in range(dim):
            term = None
            for d in range(dim):
                f = x(dK[d] if d == k else dM[d], d)
                term = f if term is None else term * f
            total = term if total is None else total + term
        return total

    def _x_from_rhs(self, bt):
        """Full recurrence from the rhs (x0 = d0 = bt / (theta diag)).

        With the pair kernel, the entry pair runs mode "cheb2f0": d0 is
        derived IN-KERNEL from the b window (no separate XLA d0 pass, no
        r-stream read — b itself is the first residual)."""
        if (self.op_cheb2 is not None and self.steps_mode == "unroll"
                and self.degree >= 3):
            sigma1 = self.theta / self.delta
            rho = 1.0 / sigma1
            rho1 = 1.0 / (2.0 * sigma1 - rho)
            rho2 = 1.0 / (2.0 * sigma1 - rho1)
            scal = jnp.stack([
                rho1 * rho, 2.0 * rho1 / self.delta,
                rho2 * rho1, 2.0 * rho2 / self.delta, self.theta,
            ]).astype(jnp.float32)
            n = self.degree - 1
            mode = "cheb2f0l" if n == 2 else "cheb2f0"
            outs = self.op_cheb2.steps2(bt, None, None, scal, mode,
                                        sdtype=self.state_dtype)
            if n == 2:
                return outs[0]
            r, d, x = outs
            return self._steps(r, d, x, k0=2, rho=rho2)
        d0 = bt / (self.theta * self._diag_trimmed())
        return self._steps(bt, d0, d0, x_is_d=True)

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        """Preconditioner vmult with x0 = 0 on a MASKED input (constrained
        entries of b must be zero; the output's are zero)."""
        bt = b if self.trimmed_io else self._trim(b)
        x = self._x_from_rhs(bt)
        if self.trimmed_io:
            return x
        return self._pad_full(x)

    def smooth(self, u: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        """u + Cheb(rhs - A u), the V-cycle smoothing step, with the
        residual fused into the exact-core kernel."""
        scal = jnp.stack([self.theta, self.theta]).astype(jnp.float32)
        if self.trimmed_io:
            # r0 + d0 + (x0 = u + d0) in ONE kernel; the recurrence then
            # accumulates into u directly — zero XLA passes per smooth
            rop = self.op_resid3 if self.op_resid3 is not None else self.op
            r0, d0, x0 = rop._run(
                "residual3t", u, (rhs,), scal, sdtype=self.state_dtype
            )
            return self._steps(r0, d0, x0)
        u = u.reshape(self.op.grid_shape)
        uk, rk = u, rhs.reshape(self.op.grid_shape)
        if self._zpad:
            zp = [(0, 0)] * (u.ndim - 1) + [(0, self._zpad - 1)]
            uk, rk = jnp.pad(uk, zp), jnp.pad(rk, zp)
        r0, d0 = self.op._run("residual", uk, (rk,), scal)
        x = self._steps(r0, d0, d0)
        return u + self._pad_full(x)

    def _steps_with_residual(self, r, d, x):
        """The _steps unrolled-pair loop, but the FINAL pair runs the
        op_cheb2r kernel in mode "cheb2lr", returning (x_final, residual)
        where residual = rhs - A x_final exactly (to smoother arithmetic
        grade).  Callers guarantee: degree-1 even and >= 2, op_cheb2 wired
        for any mid pairs."""
        sigma1 = self.theta / self.delta
        sdt = self.state_dtype
        if sdt == "bf16":
            r = r.astype(jnp.bfloat16)
            d = d.astype(jnp.bfloat16)
        n = self.degree - 1
        rho = 1.0 / sigma1
        k = 0
        while k < n - 2:
            rho1 = 1.0 / (2.0 * sigma1 - rho)
            rho2 = 1.0 / (2.0 * sigma1 - rho1)
            scal = jnp.stack([
                rho1 * rho, 2.0 * rho1 / self.delta,
                rho2 * rho1, 2.0 * rho2 / self.delta,
            ]).astype(jnp.float32)
            r, d, x = self.op_cheb2.steps2(d, r, x, scal, "cheb2",
                                           sdtype=sdt)
            rho = rho2
            k += 2
        rho1 = 1.0 / (2.0 * sigma1 - rho)
        rho2 = 1.0 / (2.0 * sigma1 - rho1)
        scal = jnp.stack([
            rho1 * rho, 2.0 * rho1 / self.delta,
            rho2 * rho1, 2.0 * rho2 / self.delta,
        ]).astype(jnp.float32)
        x2, r_out = self.op_cheb2r.steps2(d, r, x, scal, "cheb2lr",
                                          sdtype=sdt)
        return x2, r_out

    def smooth_and_residual(self, u, rhs):
        """(u', rhs - A u') — the V-cycle's FINAL pre-smooth step and the
        pre-restriction residual in one pass chain: when the op_cheb2r
        kernel is wired, the residual rides the recurrence's last pair
        (one whole residual1t HBM pass disappears, VERDICT r4 item 2);
        falls back to smooth() + residual() otherwise."""
        n = self.degree - 1
        fused = (self.trimmed_io and self.op_cheb2r is not None
                 and self.steps_mode == "unroll" and n >= 2 and n % 2 == 0
                 and (n == 2 or self.op_cheb2 is not None))
        if not fused:
            un = self.smooth(u, rhs)
            return un, self.residual(un, rhs)
        scal = jnp.stack([self.theta, self.theta]).astype(jnp.float32)
        rop = self.op_resid3 if self.op_resid3 is not None else self.op
        r0, d0, x0 = rop._run(
            "residual3t", u, (rhs,), scal, sdtype=self.state_dtype
        )
        return self._steps_with_residual(r0, d0, x0)

    def residual(self, u: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        """rhs - A u on the free DoFs (constrained entries read rhs, which
        is zero under the solver invariant) — one fused kernel pass."""
        if self.trimmed_io:
            (r0,) = self.op._run("residual1t", u, (rhs,))
            return r0
        u = u.reshape(self.op.grid_shape)
        scal = jnp.stack([self.theta, self.theta]).astype(jnp.float32)
        uk, rk = u, rhs.reshape(self.op.grid_shape)
        if self._zpad:
            zp = [(0, 0)] * (u.ndim - 1) + [(0, self._zpad - 1)]
            uk, rk = jnp.pad(uk, zp), jnp.pad(rk, zp)
        r0, _ = self.op._run("residual", uk, (rk,), scal)
        return self._pad_full(r0)


@pytree_dataclass
class FusedVectorChebyshev:
    """Chebyshev smoother for the VECTOR elasticity operator with the
    recurrence fused into the Pallas kernel (ops/pallas_elasticity.py).

    Mathematically identical to :class:`Chebyshev` on the free DoFs:
    3-component state lives as TUPLES of trimmed per-component arrays
    (the global last planes dropped, constrained entries identically zero
    inside the production solver), each recurrence step is ONE kernel
    launch computing r'_c = r_c - M A M d, d'_c = c0 d_c + c1 r'_c/diag_c,
    x'_c = x_c + d'_c — the elementwise updates ride the operator kernel's
    DMA streams instead of 9+ separate XLA passes over 3-component fields
    (the vector twin of FusedChebyshev; VERDICT r4 item 5).

    ``op`` is the exact banded vector kernel (residual half-steps);
    ``op_smooth`` (optional) the bf16 mxu-core twin driving the recurrence
    (the scalar-operator precedent: recurrences tolerate a bf16-grade
    operator, residuals must not — CLAUDE.md round-2 lesson)."""

    degree: int = static_field()
    op: object = None
    op_smooth: object = None
    theta: jnp.ndarray = None
    delta: jnp.ndarray = None

    @property
    def inv_diag(self):
        return self.op.inv_diag

    @property
    def _zpad(self):
        return getattr(self.op, "zpad", 0)

    def _trim(self, b):
        """Stacked full-grid (3, g) -> tuple of 3 trimmed (lane-padded)."""
        g = self.op.grid_shape
        Z = self.op.n[2] * self.op.degree
        bt = b.reshape((3,) + g)[:, : g[0] - 1, : g[1] - 1, :Z]
        if self._zpad:
            bt = jnp.pad(bt, ((0, 0), (0, 0), (0, 0), (0, self._zpad)))
        return (bt[0], bt[1], bt[2])

    def _pad_full(self, ts):
        x = jnp.stack(ts)
        if self._zpad:
            x = x[..., : self.op.grid_shape[2] - 1]
        return jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1)))

    def _diag_trimmed(self):
        """Per-component trimmed separable diagonals (XLA; the in-kernel
        epilogues rebuild the same factors in VMEM)."""
        op = self.op
        g = op.grid_shape
        mu, lam = op.mu, op.lam
        al = 2.0 * mu + lam

        def ax(v, d):
            v = v[: g[d] - 1]
            if d == 2 and self._zpad:
                v = jnp.pad(v, (0, self._zpad), constant_values=1.0)
            return v.reshape([-1 if a == d else 1 for a in range(3)])

        terms = (
            ax(op.dK1[0], 0) * ax(op.dM1[1], 1) * ax(op.dM1[2], 2),
            ax(op.dM1[0], 0) * ax(op.dK1[1], 1) * ax(op.dM1[2], 2),
            ax(op.dM1[0], 0) * ax(op.dM1[1], 1) * ax(op.dK1[2], 2),
        )
        return tuple(
            sum((al if k == c else mu) * terms[k] for k in range(3))
            for c in range(3)
        )

    def _steps(self, r, d, x):
        """Unrolled fused recurrence on tuple state; the last step runs
        mode "chebl" (only x' written)."""
        sop = self.op_smooth if self.op_smooth is not None else self.op
        sigma1 = self.theta / self.delta
        rho = 1.0 / sigma1
        for k in range(self.degree - 1):
            rho_new = 1.0 / (2.0 * sigma1 - rho)
            scal = jnp.stack(
                [rho_new * rho, 2.0 * rho_new / self.delta]
            ).astype(jnp.float32)
            last = k == self.degree - 2
            outs = sop._run("chebl" if last else "cheb", d, r + x, scal)
            if last:
                return tuple(outs)
            r, d, x = tuple(outs[:3]), tuple(outs[3:6]), tuple(outs[6:9])
            rho = rho_new
        return x

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        """Preconditioner vmult with x0 = 0 on a MASKED input."""
        bt = self._trim(b)
        if self.degree == 1:
            dg = self._diag_trimmed()
            return self._pad_full(
                tuple(bt[c] / (self.theta * dg[c]) for c in range(3))
            )
        dg = self._diag_trimmed()
        d0 = tuple(bt[c] / (self.theta * dg[c]) for c in range(3))
        return self._pad_full(self._steps(bt, d0, d0))

    def smooth(self, u: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        """u + Cheb(rhs - A u) with the residual fused into the exact
        kernel (mode "residual": r0 and d0 in one pass)."""
        u = u.reshape(self.op.shape)
        scal = jnp.stack([self.theta, self.theta]).astype(jnp.float32)
        uk = u
        if self._zpad:
            uk = jnp.pad(u, ((0, 0), (0, 0), (0, 0), (0, self._zpad - 1)))
        outs = self.op._run("residual", uk, self._trim(rhs), scal)
        r0, d0 = tuple(outs[:3]), tuple(outs[3:6])
        if self.degree == 1:
            return u + self._pad_full(d0)
        return u + self._pad_full(self._steps(r0, d0, d0))

    def residual(self, u: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
        """rhs - A u on the free DoFs — one fused kernel pass."""
        u = u.reshape(self.op.shape)
        uk = u
        if self._zpad:
            uk = jnp.pad(u, ((0, 0), (0, 0), (0, 0), (0, self._zpad - 1)))
        outs = self.op._run("residual1", uk, self._trim(rhs))
        return self._pad_full(tuple(outs))


def _pseudo_random_grid(shape, dtype) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.uniform(-0.5, 0.5, size=shape).astype(np.float64)


def _host_free_mask(op) -> np.ndarray | None:
    """Host-side free-DoF mask for the eigenvalue start vector.

    Prefers the operator's separable 1D factors (tiny device reads) over
    materializing + reading back the full grid mask."""
    m1 = getattr(op, "mask1", None)
    if m1 is not None:
        m = np.asarray(m1[0], dtype=np.float64)
        for f in m1[1:]:
            m = np.multiply.outer(m, np.asarray(f, dtype=np.float64))
        return m
    m = getattr(op, "mask", None)
    return None if m is None else np.asarray(m, dtype=np.float64)


def estimate_eigenvalues(
    op, inv_diag: jnp.ndarray | None, n_iter: int, v0: jnp.ndarray
) -> tuple[float, float]:
    """Extreme eigenvalues of P^-1 A via n_iter CG-Lanczos iterations.

    ``inv_diag=None`` derives the Jacobi preconditioner from ``op.inv_diag``
    inside the traced program (no large captured constants).  The operator
    pytree is a jit ARGUMENT (like models/poisson.py:_solve), not a closure:
    kron operators on large grids carry dense 1D matrices (a 2D Q7 r=9
    level is 2 x 51 MB), and closure capture would embed them as HLO
    constants in every per-level setup compile — the remote-compile payload
    blowup of the round-1 notes, hit by the polynomial driver at r>=8."""
    n_iter = int(n_iter)

    @jax.jit
    def run(op, inv_diag, b):
        idg = op.inv_diag if inv_diag is None else inv_diag
        r = b
        x = jnp.zeros_like(b)
        z = idg * r
        rz = jnp.vdot(r, z)

        def step(carry, _):
            x, r, p, rz, stop = carry
            Ap = op.apply(p)
            pAp = jnp.vdot(p, Ap)
            bad = jnp.logical_or(stop, pAp <= 0.0)
            alpha = jnp.where(bad, jnp.inf, rz / jnp.where(pAp == 0, 1.0, pAp))
            x = x + jnp.where(bad, 0.0, alpha) * p
            r = r - jnp.where(bad, 0.0, alpha) * Ap
            z = idg * r
            rz_new = jnp.vdot(r, z)
            beta = jnp.where(bad, 0.0, rz_new / jnp.where(rz == 0, 1.0, rz))
            p = z + beta * p
            stop = jnp.logical_or(bad, rz_new <= 1e-300)
            return (x, r, p, rz_new, stop), (alpha, beta)

        _, (alphas, betas) = jax.lax.scan(
            step, (x, r, z, rz, jnp.bool_(False)), None, length=n_iter
        )
        return alphas, betas

    alphas_dev, betas_dev = run(op, inv_diag, v0)
    alphas = np.asarray(alphas_dev, dtype=np.float64)
    betas = np.asarray(betas_dev, dtype=np.float64)
    valid = np.isfinite(alphas) & (alphas != 0) & np.isfinite(betas)
    k = int(np.sum(np.cumprod(valid)))  # leading run of valid steps
    if k == 0:
        return 1.0, 1.0
    a = alphas[:k]
    b = betas[:k]
    diag = 1.0 / a
    diag[1:] += b[:-1] / a[:-1]
    off = np.sqrt(np.maximum(b[:-1], 0.0)) / a[:-1]
    T = np.diag(diag)
    if k > 1:
        T += np.diag(off, 1) + np.diag(off, -1)
    ev = np.linalg.eigvalsh(T)
    if not (np.isfinite(ev[0]) and np.isfinite(ev[-1]) and ev[-1] > 0):
        # long low-precision CG runs can break down past convergence;
        # degenerate estimates fall back to the safe unit interval
        return 1.0, 1.0
    return float(ev[0]), float(ev[-1])


def chebyshev_bounds(
    min_eig: float, max_eig: float, smoothing_range: float, degree: int | None
) -> tuple[float, float, int]:
    """deal.II's interval/degree rules (see module docstring). Returns
    (alpha, beta, degree)."""
    beta = 1.2 * max_eig
    if smoothing_range > 1.0:
        alpha = max_eig / smoothing_range
    else:
        alpha = min(0.9 * max_eig, min_eig)
    # keep the interval non-degenerate on BOTH ends: low-precision Lanczos
    # breakdown can report min_eig ~ 0, which would blow the adaptive
    # degree below (the Jacobi-preconditioned operator's true condition
    # number is far under 1e6 for every configuration here)
    alpha = max(alpha, beta * 1e-6)
    alpha = min(alpha, beta * (1.0 - 1e-8))
    if degree is None:
        actual_range = beta / alpha
        sigma = (1.0 - np.sqrt(1.0 / actual_range)) / (
            1.0 + np.sqrt(1.0 / actual_range)
        )
        eps = smoothing_range
        degree = int(
            1
            + np.log(1.0 / eps + np.sqrt(1.0 / eps**2 - 1.0))
            / np.log(1.0 / max(sigma, 1e-12))
        )
        # sanity cap: a degenerate eigenvalue estimate (low-precision CG
        # breakdown can report min_eig ~ 0) would otherwise request an
        # astronomically unrolled recurrence; every legitimate coarse-solver
        # degree in this framework is far below this bound
        degree = min(max(degree, 1), 512)
    return float(alpha), float(beta), int(degree)


def make_chebyshev(
    op,
    *,
    smoothing_range: float = 15.0,
    degree: int | None = 5,
    eig_cg_n_iterations: int = 10,
    inv_diag: jnp.ndarray | None = None,
    free_mask: jnp.ndarray | None = None,
    fused_smoother_op=None,
    trimmed_io: bool = False,
    resid3_op=None,
    state_dtype: str = "f32",
    cheb2_op=None,
    cheb2r_op=None,
) -> Chebyshev:
    """Set up the smoother for a level operator (host-side; runs eig-CG on device).

    Defaults mirror the reference smoothing levels; pass
    ``smoothing_range=1e-3, degree=None, eig_cg_n_iterations=op.n_dofs`` for
    the coarse-level Chebyshev-as-solver configuration (reference:
    source/geometric_multigrid/program.cc:267-279).
    """
    if inv_diag is not None:
        shape, dtype = inv_diag.shape, inv_diag.dtype
    else:
        # derive shape/dtype without materializing op.inv_diag (it may be a
        # lazily computed O(N^dim) product of separable factors)
        shape = getattr(op, "shape", None) or getattr(op, "grid_shape", None)
        if shape is None:
            shape, dtype = op.inv_diag.shape, op.inv_diag.dtype
        else:
            dtype = op.dtype if hasattr(op, "dtype") else op.inv_diag.dtype
    if int(np.prod(shape)) > 2**25:
        # huge grids: generate the start vector on device (host->device
        # uploads through the tunneled attachment are too slow); any
        # free-DoF-supported start vector yields the same Lanczos extremes
        v0_dev = jax.random.uniform(
            jax.random.PRNGKey(42), shape, dtype, -0.5, 0.5
        )
        if free_mask is not None:
            v0_dev = v0_dev * jnp.asarray(free_mask, dtype)
        elif getattr(op, "mask1", None) is not None:
            for d, f in enumerate(op.mask1):
                shp = [1] * len(shape)
                shp[d] = f.shape[0]
                v0_dev = v0_dev * f.reshape(shp)
        elif getattr(op, "mask", None) is not None:
            v0_dev = v0_dev * op.mask
    else:
        v0 = _pseudo_random_grid(shape, dtype)
        if free_mask is not None:
            v0 = v0 * np.asarray(free_mask, dtype=np.float64)
        else:
            m = _host_free_mask(op)
            if m is not None:
                v0 = v0 * m
        v0_dev = jnp.asarray(v0, dtype)
    # Cap the Lanczos length: "eig iterations = m()" (the reference's
    # Chebyshev-as-solver coarse config) is an UPPER bound — deal.II's
    # SolverCG stops at convergence, and the extreme-eigenvalue estimates
    # stabilize after tens of iterations.  Without a cap, a LARGE coarse
    # level (the 2D p-ladder's Q1 level: 263k DoFs at r=9) requests a
    # 263k-step device scan AND a (263k)^2 host tridiagonal (np.diag
    # MemoryError, r4_batch7 capture).  256 leaves every golden-table
    # configuration untouched (all golden coarse levels are < 256 DoFs).
    import os

    cap = int(os.environ.get("PMG_EIG_MAX_ITERS", "256"))
    n_iter = max(1, min(int(eig_cg_n_iterations), int(np.prod(shape)), cap))
    # PMG_EIG_CACHE=1 (opt-in, set by bench.py): persist the Lanczos
    # extremes to the disk probe cache.  The estimate is deterministic for
    # a given (operator family, geometry, start vector, backend), and each
    # per-level estimate costs a full remote jit compile — round 4's bench
    # run died of the accumulated cold-start cost (VERDICT r4 item 1c).
    # The key captures the operator identity only through its family/
    # geometry fields, so this stays OFF for data-dependent operators
    # (variable coefficients, general geometry) unless callers know their
    # coefficient stream is run-invariant.
    eig_key = None
    if os.environ.get("PMG_EIG_CACHE", "0") == "1":
        from ..utils import probe_cache

        eig_key = (type(op).__name__, getattr(op, "core", None),
                   getattr(op, "variant", None),
                   tuple(int(s) for s in shape),
                   int(getattr(op, "degree", 0)), str(dtype), n_iter,
                   free_mask is not None)
        hit = probe_cache.get("eig", eig_key)
        if hit is not None:
            min_eig, max_eig = float(hit[0]), float(hit[1])
            eig_key = None  # no re-store
        else:
            min_eig, max_eig = estimate_eigenvalues(
                op, inv_diag, n_iter, v0_dev)
            probe_cache.put("eig", eig_key, [min_eig, max_eig])
    else:
        min_eig, max_eig = estimate_eigenvalues(op, inv_diag, n_iter, v0_dev)
    alpha, beta, deg = chebyshev_bounds(min_eig, max_eig, smoothing_range, degree)
    theta = jnp.asarray((beta + alpha) / 2.0, dtype)
    delta = jnp.asarray((beta - alpha) / 2.0, dtype)
    if fused_smoother_op is not None:
        return FusedChebyshev(
            degree=deg, op=op, op_smooth=fused_smoother_op,
            op_resid3=resid3_op, trimmed_io=trimmed_io,
            state_dtype=state_dtype, op_cheb2=cheb2_op,
            op_cheb2r=cheb2r_op,
            theta=theta, delta=delta,
        )
    return Chebyshev(
        degree=deg,
        op=op,
        inv_diag=inv_diag,
        theta=theta,
        delta=delta,
    )
