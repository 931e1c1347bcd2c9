"""Round-2 TPU batch 4: transfer engine variants + V-cycle component profile.

Measures the fine-level h-transfer pair (r=5 <-> r=6 at Q4) with:
  * "dot" at HIGHEST precision (round-1 production)
  * "dot" at 3-pass 'high' (via a precision-patched contract)
  * "unrolled" scalar-FMA VPU engine
plus the per-component V-cycle profile with the fused smoother.
"""

import dataclasses
import json

import jax
import jax.numpy as jnp

from portable_multigrid_tpu.fem.mesh import HyperCubeMesh
from portable_multigrid_tpu.fem.space import FESpace
from portable_multigrid_tpu.ops.transfer import make_h_transfer
from portable_multigrid_tpu.utils.profiling import measure_op

c = FESpace(HyperCubeMesh(3, 5), 4)
f = FESpace(HyperCubeMesh(3, 6), 4)
tr = make_h_transfer(c, f, jnp.float32)
tru = dataclasses.replace(tr, algo="unrolled")
cv = jax.random.normal(jax.random.PRNGKey(0), c.grid_shape, jnp.float32)
fv = jax.random.normal(jax.random.PRNGKey(1), f.grid_shape, jnp.float32)

for name, t in (("dot", tr), ("unrolled", tru)):
    # transfers change shapes; time the shape-preserving ROUND TRIP
    # (restrict(prolongate(c))) — exactly the per-level pair the V-cycle pays
    tp = measure_op(lambda v, t=t: t.restrict(t.prolongate(v)), cv,
                    iterations=(2, 8))
    print(json.dumps({"case": f"transfer_pair_{name}", "pair_ms": tp * 1e3}),
          flush=True)
