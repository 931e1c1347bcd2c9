"""Round-4 TPU batch 5: retry the r=7 512-lane block probes from batch 4.

Batch 4's probe lambdas closure-captured the (r, x) recurrence state —
two 512^3 arrays — which the remote compiler embeds as HLO constants:
HTTP 413 for the big blocks and broken-pipe stress for the rest (the
round-2 gotcha, CLAUDE.md).  Here every grid-sized input is DERIVED from
the single carried argument inside the jit (dd, dd.astype(f32)), so the
request body stays kernel-sized.  Timing is unaffected: measure_op slopes
over iteration counts, and the derived inputs add one cast the XLA
scheduler overlaps with the first DMA.

Question being answered: the 2026-08 toolchain lifted the round-3
"16x16 @ >256 lanes" Mosaic crash for the mxu core and the cheb2 pairs —
does a bigger block beat the production 8x8 at the r=7 fine level
(512-lane, 135M DoF)?  If yes, production wiring follows.

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32
bf16 = jnp.bfloat16


def probe(tag, fn):
    try:
        out = fn()
        rec = {"case": tag, "ok": True}
        if isinstance(out, dict):
            rec.update(out)
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:300]}), flush=True)


sp7 = FESpace(HyperCubeMesh(3, 7), 4)
t7 = tuple(s - 1 for s in sp7.grid_shape)  # (512, 512, 512)
scal2 = np.asarray([1.1, 0.7], np.float32)
s4 = np.asarray([1.1, 0.7, 0.9, 0.5], np.float32)


def time_cheb(bx, by):
    from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace

    op = make_pallas_laplace(sp7, f32, bx=bx, by=by, core="mxu")
    d = jax.random.normal(jax.random.PRNGKey(0), t7, bf16)

    def step(dd):
        # r/x derived from dd on device — nothing grid-sized is captured
        return op._run("cheb", dd, (dd, dd.astype(f32)), scal2,
                       sdtype="bf16")[0]

    f = jax.jit(step)
    f.lower(d).compile()
    ms = measure_op(f, d, repeats=3) * 1e3
    return {"ms": ms}


def time_cheb2(bx, by):
    from portable_multigrid_tpu.ops.pallas_cheb2 import make_cheb2

    kern = make_cheb2(sp7, f32, bx=bx, by=by)
    d = jax.random.normal(jax.random.PRNGKey(0), t7, bf16)

    def pair(dd):
        return kern.steps2(dd, dd, dd.astype(f32), s4, "cheb2",
                           sdtype="bf16")[0]

    f = jax.jit(pair)
    f.lower(d).compile()
    ms = measure_op(f, d, repeats=3) * 1e3
    return {"ms_pair": ms}


probe("cheb_mxu_8x8_r7", lambda: time_cheb(8, 8))
probe("cheb_mxu_16x8_r7", lambda: time_cheb(16, 8))
probe("cheb_mxu_16x16_r7", lambda: time_cheb(16, 16))
probe("cheb2_8x8_r7", lambda: time_cheb2(8, 8))
probe("cheb2_16x8_r7", lambda: time_cheb2(16, 8))
probe("cheb2_16x16_r7", lambda: time_cheb2(16, 16))
print("batch5 done", flush=True)
