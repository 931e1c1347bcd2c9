"""HLO-level evidence that halo ppermutes are asynchronous (VERDICT r2 #9).

Compiles the 8-virtual-device sharded V-cycle and inspects the optimized
HLO: XLA lowers each `jax.lax.ppermute` to a collective-permute-start /
collective-permute-done pair; any compute instructions scheduled between
start and done overlap the transfer.  Records, per pair, how many
non-trivial ops sit between start and done.
"""

import re
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from portable_multigrid_tpu.parallel.poisson import ShardedGeometricPoisson


def main():
    prob = ShardedGeometricPoisson(
        3, 2, 4, devices=jax.devices()[:8], dtype=jnp.float32, variant="kron"
    )
    # build the jitted sharded V-cycle apply (not the full CG) for a
    # readable program: one preconditioner application
    S = prob.n_shards
    fine = prob.spaces[-1]
    n = fine.mesh.cells_per_axis
    from portable_multigrid_tpu.parallel.sharding import partition_axis0
    from portable_multigrid_tpu.solvers.vcycle import VCycle

    rng = np.random.default_rng(0)
    b = rng.standard_normal(fine.grid_shape).astype(np.float32)
    b_st = jnp.asarray(partition_axis0(b, n, prob.degree, S))

    def vapply(levels_stacked, b_stacked):
        levels = prob._assemble_local(levels_stacked)
        mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                    levels=levels)
        return mg.apply(b_stacked[0])[None]

    f = jax.jit(
        jax.shard_map(
            vapply, mesh=prob.mesh,
            in_specs=(P("x"), P("x")), out_specs=P("x"),
            check_vma=False,
        )
    )
    compiled = f.lower(prob.levels_stacked, b_st).compile()
    hlo = compiled.as_text()

    lines = hlo.splitlines()
    pairs = []
    starts = {}
    for idx, ln in enumerate(lines):
        m = re.search(r"%?(\S*collective-permute-start\S*)\s*=", ln)
        if m:
            starts[m.group(1).rstrip(".0123456789")] = idx
        if "collective-permute-done" in ln:
            ms = re.search(r"done\S*\s*=\s*\S+\s+\S*done\(([^)]+)\)", ln)
            pairs.append(idx)
    n_start = hlo.count("collective-permute-start")
    n_done = hlo.count("collective-permute-done")
    # distance in instructions between each start and the nearest done after
    gaps = []
    start_idx = [i for i, ln in enumerate(lines)
                 if "collective-permute-start(" in ln
                 or re.search(r"collective-permute-start\(", ln)]
    done_idx = [i for i, ln in enumerate(lines)
                if "collective-permute-done(" in ln]
    for s in start_idx:
        nxt = min((d for d in done_idx if d > s), default=None)
        if nxt is not None:
            between = [
                ln for ln in lines[s + 1: nxt]
                if re.search(r"=\s*(f32|bf16|f64)", ln)
                and "parameter" not in ln
            ]
            gaps.append(len(between))
    print(f"collective-permute-start count: {n_start}")
    print(f"collective-permute-done  count: {n_done}")
    if gaps:
        print(f"pairs analysed: {len(gaps)}; compute ops between "
              f"start/done: min={min(gaps)} max={max(gaps)} "
              f"mean={sum(gaps)/len(gaps):.1f}")
        print(f"pairs with >0 overlapped compute ops: "
              f"{sum(1 for g in gaps if g > 0)}/{len(gaps)}")
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sharded_vcycle_hlo.txt"
    with open(out, "w") as fh:
        fh.write(hlo)
    print(f"full HLO written to {out} ({len(lines)} lines)")


if __name__ == "__main__":
    main()
