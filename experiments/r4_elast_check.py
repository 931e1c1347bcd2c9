"""Interpret-mode parity check for the pallas elasticity kernel (CPU)."""
import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.elasticity import make_elasticity
from portable_multigrid_tpu.ops.pallas_elasticity import make_pallas_elasticity

for (p, n, bx, by, zpad) in [(2, 4, 4, 4, 0), (2, 8, 4, 4, 0), (2, 4, 4, 4, 4),
                             (3, 8, 8, 8, 0)]:
    r = int(np.log2(n))
    sp = FESpace(HyperCubeMesh(3, r), p)
    mu, lam = 0.7, 1.3
    ref = make_elasticity(sp, jnp.float64, mu=mu, lam=lam, variant="kron")
    op = make_pallas_elasticity(sp, jnp.float64, mu=mu, lam=lam, bx=bx, by=by,
                                interpret=True, zpad=zpad)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(ref.shape))
    a_ref = ref.apply(u)
    a_pal = op.apply(u)
    err = float(jnp.max(jnp.abs(a_ref - a_pal)) / jnp.max(jnp.abs(a_ref)))
    dref = 1.0 / np.asarray(
        __import__("portable_multigrid_tpu.ops.elasticity",
                   fromlist=["_elasticity_diagonal"])._elasticity_diagonal(
            sp, mu, lam)
    )
    derr = float(np.max(np.abs(dref - np.asarray(op.inv_diag)))
                 / np.max(np.abs(dref)))
    print(f"p={p} n={n} bx={bx} by={by} zpad={zpad}: apply rel err {err:.2e} "
          f"inv_diag rel err {derr:.2e}")
    assert err < 1e-12 and derr < 1e-12, "MISMATCH"
print("ALL OK")
