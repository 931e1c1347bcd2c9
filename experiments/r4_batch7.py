"""Round-4 TPU batch 7: rescue the 2D Q7 p-ladder bench (batch-3 413).

batch 3 ran the ladder at r=9 with variant="kron": the kron operator
stores ASSEMBLED global 1D matrices (ndof x ndof dense), which in 2D at
r=9 Q7 is 3585^2 f32 = 51 MB per matrix kind per level — the 7-level
ladder's closure constants total ~300 MB and the remote compiler rejects
the request (HTTP 413, the round-2 gotcha).  Two rescues:

(a) r=9 with variant="sumfac" — element-local B/Dco constants only
    (kilobytes); measures the big-grid ladder on the constant-free path;
(b) r=8 with variant="kron" — quarter-size constants (~75 MB) fit the
    request limit; measures the fast kron path at 3.2M DoF.

Reference driver: /root/reference/source/polynomial_multigrid/program.cc:439-443.
Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.models.poisson import PolynomialMultigridPoisson
from portable_multigrid_tpu.solvers.vcycle import VCycle
from portable_multigrid_tpu.utils.profiling import measure_op

f32 = jnp.float32


def masked_b(space, seed=1):
    b = jax.random.normal(jax.random.PRNGKey(seed), space.grid_shape, f32)
    for d in range(space.dim):
        m1 = jnp.asarray(space.free_mask_1d(), f32)
        shp = [1] * space.dim
        shp[d] = m1.shape[0]
        b = b * m1.reshape(shp)
    return b


def bench_pladder(r, variant):
    model = PolynomialMultigridPoisson(2, 7, r, dtype=f32, variant=variant)
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=bool(getattr(model, "fine_trimmed", False)),
                levels=model.levels)
    b = masked_b(fine)
    t = measure_op(mg.apply, b, iterations=(2, 6), repeats=3)
    rec = {
        "metric": "vcycle_dof_throughput_pladder_2d_q7",
        "value": fine.n_dofs / t,
        "unit": "DoF/s",
        "vs_baseline": fine.n_dofs / t / 1.0e9,
        "vcycle_time_s": t,
        "n_dofs": fine.n_dofs,
        "bench": f"pladder_2d_q7_r{r}_{variant}",
        "device": str(jax.devices()[0]),
        "degree": 7, "dim": 2, "variant": variant, "n_levels": 7,
    }
    print(json.dumps(rec), flush=True)


import sys

CASES = ((9, "sumfac"), (8, "kron"))
if len(sys.argv) > 1:
    # run ONE case per process: the first attempt's r=9 sumfac run crashed
    # the TPU worker and the same-process r=8 kron call inherited the dead
    # worker ("TPU worker process crashed or restarted").
    rr, vv = sys.argv[1].split(":")
    CASES = ((int(rr), vv),)

for rr, vv in CASES:
    print(f"--- bench pladder r={rr} {vv} ---", flush=True)
    try:
        bench_pladder(rr, vv)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": f"pladder_r{rr}_{vv}",
                          "error": repr(e)[:300]}), flush=True)
print("batch7 done", flush=True)
