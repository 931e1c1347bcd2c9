"""Round-3 TPU batch 15: the reference-parity 2D p-ladder + elasticity
sweep rows (batch-13's r=9 p-ladder attempt stalled on dense-matrix
upload/compile payloads; the reference's own 2D sweep tops out at r=7 —
source/polynomial_multigrid/program.cc:407,439-441), plus a tunnel
upload-speed probe to pin the stall's root cause in the docs.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def probe(tag, fn):
    try:
        out = fn()
        rec = {"case": tag, "ok": True}
        if isinstance(out, dict):
            rec.update(out)
        print(json.dumps(rec), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"case": tag, "error": repr(e)[:300]}), flush=True)


# --- 1. host->device upload speed through the tunneled attachment ---------
def upload_speed():
    mb = 48
    a = np.random.default_rng(0).random((mb * 1024 * 1024 // 8,))
    t0 = time.perf_counter()
    d = jax.device_put(a)
    float(jnp.sum(d.ravel()[:1]))  # sync
    dt = time.perf_counter() - t0
    return {"mb": mb, "s": dt, "mb_per_s": mb / dt}


probe("upload_speed", upload_speed)

from portable_multigrid_tpu.models.elasticity import ElasticityMultigrid
from portable_multigrid_tpu.models.poisson import PolynomialMultigridPoisson


def time_solve(mk, tag, rtol=1e-5):
    prob = mk()
    _, st0 = prob.solve(rtol=rtol)  # warm/compile
    t0 = time.perf_counter()
    _, st = prob.solve(rtol=rtol)
    dt = time.perf_counter() - t0
    return {
        "sweep": tag, "n_dofs": st.n_dofs, "iterations": st.iterations,
        "solve_s": dt, "dofs_per_s": st.n_dofs / dt,
    }


probe("2d_q7_pladder_r7", lambda: time_solve(
    lambda: PolynomialMultigridPoisson(
        2, 7, 7, dtype=jnp.float32, variant="kron"), "2d_q7_pladder_r7"))
probe("2d_q7_pladder_r8", lambda: time_solve(
    lambda: PolynomialMultigridPoisson(
        2, 7, 8, dtype=jnp.float32, variant="kron"), "2d_q7_pladder_r8"))
probe("3d_q3_elasticity_r4", lambda: time_solve(
    lambda: ElasticityMultigrid(3, 3, 4, dtype=jnp.float32),
    "3d_q3_elasticity_r4"))
