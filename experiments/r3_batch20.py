"""Round-3 TPU batch 20: REAL-hardware compile probes for the sharded
production fast path.

The sharded solvers can only RUN multi-chip (this environment has one
tunneled chip), but every kernel they launch is an ordinary single-chip
Pallas program — so Mosaic compileability of the whole sharded fast path
can be validated here by constructing the per-shard kernels directly and
compiling them on halo-extended local shapes:

(a) 1D slab operator kernels (make_pallas_slab): modes apply / residual3f /
    chebf — the ShardedFusedChebyshev path (parallel/sharding.py);
(b) xext cheb2 pair (1D slab sharding, parallel/poisson.py);
(c) xext+yext cheb2 pair (2D pencil sharding, parallel/mesh2d.py);
(d) 2D pencil slab operator (make_pallas_slab2d) mode apply.

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace


def probe(tag, fn):
    try:
        out = fn()
        rec = {"case": tag, "ok": True}
        if isinstance(out, dict):
            rec.update(out)
        print(json.dumps(rec), flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:300]}), flush=True)
        return False


R, P, S = 6, 4, 4  # r=6 Q4 over 4 shards: n=64, n_loc=16, 256 lanes


def slab_mode(mode, core="banded", bx=16, by=16):
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_slab

    sp = FESpace(HyperCubeMesh(3, R), P)
    n = sp.mesh.cells_per_axis
    n_loc = n // S
    op = make_pallas_slab(sp, n_loc, jnp.float32, bx=min(bx, n_loc), by=by,
                          core=core)
    g = op.grid_shape  # (n_loc*p + 1, n*p + 1, n*p + 1)
    L, N1m, Z = g[0] - 1, g[1] - 1, n * P
    if mode == "apply":
        u = jnp.zeros(g, jnp.float32)
        f = jax.jit(lambda uu: op._run(mode, uu))
        f.lower(u).compile()
    elif mode == "residual3f":
        u_ext = jnp.zeros((L + 1, N1m, Z), jnp.float32)
        rhs = jnp.zeros((L, N1m, Z), jnp.float32)
        scal = jnp.stack([jnp.float32(1.1)] * 2)
        f = jax.jit(lambda uu: op._run(mode, uu, (rhs,), scal)[2])
        f.lower(u_ext).compile()
    elif mode == "chebf":
        d_ext = jnp.zeros((L + 1, N1m, Z), jnp.float32)
        r = jnp.zeros((L, N1m, Z), jnp.float32)
        x = jnp.zeros((L, N1m, Z), jnp.float32)
        scal = jnp.stack([jnp.float32(0.5), jnp.float32(0.25)])
        f = jax.jit(lambda dd: op._run(mode, dd, (r, x), scal)[2])
        f.lower(d_ext).compile()
    return {"mode": mode, "core": core}


probe("slab_apply_banded", lambda: slab_mode("apply"))
probe("slab_residual3f_banded_8x8",
      lambda: slab_mode("residual3f", bx=8, by=8))
probe("slab_chebf_mxu", lambda: slab_mode("chebf", core="mxu"))


def cheb2_xext():
    """The 1D-slab pair kernel exactly as _build_stacked_cheb2 shapes it."""
    import dataclasses as _dc

    from portable_multigrid_tpu.ops.pallas_cheb2 import _roundup8, make_cheb2

    sp = FESpace(HyperCubeMesh(3, R), P)
    n = sp.mesh.cells_per_axis
    n_loc = n // S
    bx, by = 8, 8
    kern = make_cheb2(sp, jnp.float32, bx=bx, by=by, zpad=0)
    nbi_loc = n_loc // bx
    x_mat_idx = {2, 3, 6, 7}
    x_fac_idx = {0, 1}
    kern = _dc.replace(
        kern, n=(n_loc, n, n), xext=True,
        mats=tuple(m[:nbi_loc] if ix in x_mat_idx else m
                   for ix, m in enumerate(kern.mats)),
        facs=tuple(f[:nbi_loc] if ix in x_fac_idx else f
                   for ix, f in enumerate(kern.facs)),
    )
    Hd, Hr = _roundup8(2 * P), _roundup8(P)
    N0t, N1t, Z = n_loc * P, n * P, n * P
    d = jnp.zeros((N0t + 4 * P, N1t, Z), jnp.float32)
    r = jnp.zeros((N0t + 2 * P, N1t, Z), jnp.float32)
    x = jnp.zeros((N0t, N1t, Z), jnp.float32)
    scal = jnp.asarray([0.5, 0.25, 0.5, 0.25], jnp.float32)
    f = jax.jit(lambda dd: kern.steps2(dd, r, x, scal, "cheb2",
                                       sdtype="f32")[1])
    f.lower(d).compile()
    return {"bx": bx, "by": by}


probe("cheb2_xext_slab", cheb2_xext)


def cheb2_xyext():
    """The 2D-pencil pair kernel exactly as _build_stacked_cheb2_2d shapes
    it (one shard's kernel; sx = sy = 2)."""
    from portable_multigrid_tpu.ops.pallas_cheb2 import _roundup8
    from portable_multigrid_tpu.parallel.mesh2d import _build_stacked_cheb2_2d

    sx = sy = 2
    sp = FESpace(HyperCubeMesh(3, R), P)
    n = sp.mesh.cells_per_axis
    nlx, nly = n // sx, n // sy
    st = _build_stacked_cheb2_2d(sp, sx, sy, jnp.float32)
    assert st is not None
    kern = jax.tree_util.tree_map(lambda a: a[0, 0], st)
    Hd, Hr = _roundup8(2 * P), _roundup8(P)
    N0t, N1t, Z = nlx * P, nly * P, n * P
    d = jnp.zeros((N0t + 4 * P, N1t + 2 * Hd, Z), jnp.float32)
    r = jnp.zeros((N0t + 2 * P, N1t + 2 * Hr, Z), jnp.float32)
    x = jnp.zeros((N0t, N1t, Z), jnp.float32)
    scal = jnp.asarray([0.5, 0.25, 0.5, 0.25], jnp.float32)
    f = jax.jit(lambda dd: kern.steps2(dd, r, x, scal, "cheb2",
                                       sdtype="f32")[1])
    f.lower(d).compile()
    return {"bx": kern.bx, "by": kern.by}


probe("cheb2_xyext_pencil", cheb2_xyext)


def slab2d_apply():
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_slab2d

    sx = sy = 2
    sp = FESpace(HyperCubeMesh(3, R), P)
    n = sp.mesh.cells_per_axis
    nlx, nly = n // sx, n // sy
    op = make_pallas_slab2d(sp, nlx, nly, jnp.float32, bx=8, by=8)
    g = op.grid_shape
    u = jnp.zeros(g, jnp.float32)
    f = jax.jit(lambda uu: op._run("apply", jnp.pad(
        uu, ((0, 0), (0, 7), (0, 0)))))
    f.lower(u).compile()
    return {"grid": list(g)}


probe("slab2d_apply_banded", slab2d_apply)
