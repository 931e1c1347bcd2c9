"""Round-2 kernel experiment batch 1 (run on the real TPU).

Measures, at 3D Q4 r=6 (17M DoF, f32):
  * banded core (exact f32) with the new double-buffered input DMA, 8x8/16x16
  * mxu core (bf16 smoother-grade), 8x8/16x16
  * kron XLA reference point

One script per TPU session (remote compiles are 10-30 min each); timing via
the dispatch-proof fori-loop slope (utils/profiling.py:measure_op).
"""

import json

import numpy as np
import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.laplace import make_laplace
from portable_multigrid_tpu.ops.pallas_laplace import make_pallas_laplace
from portable_multigrid_tpu.utils.profiling import measure_op

REF = 6
sp = FESpace(HyperCubeMesh(3, REF), 4)
n_dofs = sp.n_dofs
print("device:", jax.devices()[0], "n_dofs:", n_dofs, flush=True)

u = jax.random.normal(jax.random.PRNGKey(0), sp.grid_shape, jnp.float32)

results = {}


def run(name, op):
    t = measure_op(op.apply, u)
    results[name] = t
    print(json.dumps({"case": name, "ms": t * 1e3,
                      "gdof_s": n_dofs / t / 1e9}), flush=True)


for bs in (16,):
    run(f"banded_{bs}x{bs}_dbin", make_pallas_laplace(
        sp, jnp.float32, bx=bs, by=bs, core="banded"))
for bs in (8, 16):
    run(f"mxu_{bs}x{bs}", make_pallas_laplace(
        sp, jnp.float32, bx=bs, by=bs, core="mxu"))

print(json.dumps(results), flush=True)
