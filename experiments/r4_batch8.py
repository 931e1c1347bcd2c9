"""Round-4 TPU batch 8: re-bench the >256-lane rows after promoting
16x16 cheb2 blocks to the first ladder rung.

experiments/r4_batch5.py measured the r=7 512-lane cheb2 pair at
11.66 ms for 16x16 vs 13.08 ms for the production 8x8 — the 2026-08
toolchain lifted the round-3 16x16@>256-lane Mosaic crash.  The auto
ladder (ops/pallas_cheb2.py:make_cheb2_auto) now tries 16x16 first above
256 lanes, with the AOT compile probe still guarding unproven shapes.
This batch captures the composed effect on the production V-cycle:

  - Q4 r=7 (512 lanes, 135M DoF): was 152.2 ms = 8.87e8 DoF/s
  - Q3 r=7 (384 lanes, 57.1M DoF): was 101.6 ms = 5.62e8 DoF/s
  - Q2 r=7 (256 lanes): control — cands unchanged at Z<=256, expect
    16.71 ms within noise.

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json
import os

import bench


def run_bench(tag, r, degree, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = r
    os.environ["PMG_BENCH_DEGREE"] = degree
    os.environ.setdefault("PMG_BENCH_VARIANT", "auto")
    for kk, v in env.items():
        os.environ[kk] = v
    print(f"--- bench {tag} ---", flush=True)
    try:
        bench.main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": tag, "error": repr(e)[:300]}), flush=True)
    for kk in env:
        os.environ.pop(kk, None)


run_bench("q4_r7_cheb2_16x16", r="7", degree="4")
run_bench("q3_r7_cheb2_16x16", r="7", degree="3")
run_bench("q2_r7_control", r="7", degree="2")


def bench_varcoeff_qdense(r):
    """The qdense MXU variable-coefficient path (commit e1ca5b5) vs the
    batch-3 sumfac rows (149.8 ms r=5 / 805.8 ms r=6)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from portable_multigrid_tpu.models.poisson import GeometricMultigridPoisson
    from portable_multigrid_tpu.solvers.vcycle import VCycle
    from portable_multigrid_tpu.utils.profiling import measure_op

    f32 = jnp.float32
    coef = lambda x, y, z: (  # noqa: E731
        1.0 + 0.5 * np.sin(np.pi * x) * np.sin(np.pi * y) * np.sin(np.pi * z)
    )
    model = GeometricMultigridPoisson(3, 4, r, dtype=f32, coefficient=coef)
    fine = model.spaces[-1]
    mg = VCycle(pre_smoothing_steps=2, post_smoothing_steps=2,
                fine_trimmed=bool(getattr(model, "fine_trimmed", False)),
                levels=model.levels)
    b = jax.random.normal(jax.random.PRNGKey(1), fine.grid_shape, f32)
    for d in range(3):
        m1 = jnp.asarray(fine.free_mask_1d(), f32)
        shp = [1, 1, 1]
        shp[d] = m1.shape[0]
        b = b * m1.reshape(shp)
    iters = (1, 3) if r >= 6 else (2, 6)
    t = measure_op(mg.apply, b, iterations=iters, repeats=3)
    print(json.dumps({
        "metric": "vcycle_dof_throughput_varcoeff_3d_q4",
        "value": fine.n_dofs / t, "unit": "DoF/s",
        "vs_baseline": fine.n_dofs / t / 1.0e9,
        "vcycle_time_s": t, "n_dofs": fine.n_dofs,
        "bench": f"varcoeff_qdense_r{r}", "degree": 4, "dim": 3,
        "variant": "qdense",
    }), flush=True)


for rr in (5, 6):
    print(f"--- bench varcoeff_qdense r={rr} ---", flush=True)
    try:
        bench_varcoeff_qdense(rr)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bench": f"varcoeff_qdense_r{rr}",
                          "error": repr(e)[:300]}), flush=True)
print("batch8 done", flush=True)
