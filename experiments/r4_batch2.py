"""Round-4 TPU batch 2: resume r4_batch1 after the q7 spill crash.

Batch 1 banked q5_r6_zpad (3.83e8) and then died inside q7_r5_zpad: the
2026-08 toolchain OOMs the p=7 banded 8x8 kernel with 106.7M of register
SPILL SLOTS (round 3 had it compiling).  make_laplace_auto now AOT-probes
every pallas candidate and degrades banded -> mxu3 rescue -> kron, so q7
is re-run first to verify the ladder, then the rows batch 1 never reached.

Run with PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
"""

import json
import os

import bench


def run_bench(tag, **env):
    os.environ["PMG_BENCH_REFINEMENTS"] = env.pop("r", "6")
    os.environ["PMG_BENCH_DEGREE"] = env.pop("degree", "4")
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


# (a) q7 retry: the probe ladder must degrade past the spilling banded 8x8
run_bench("q7_r5_zpad", degree="7", r="5")

# (b) Q6: the mxu3-as-exact rescue (row was "-"; banded crashes at p=6)
run_bench("q6_r6_mxu3_rescue", degree="6")

# (c) post-cheb2 rows nearest the north star (pre-cheb2: 8.7e8 / 5.2e8)
run_bench("q2_r7_cheb2", degree="2", r="7")
run_bench("q3_r7_cheb2", degree="3", r="7")

# (d) Q1 amortized (Q1 r=7 is fixed-cost-bound at 2.1M DoF)
run_bench("q1_r8_amortized", degree="1", r="8")

# (e) the r=6 cycle's coarse-recursion share == a full r=5-rooted cycle
run_bench("q4_r5_coarse_share", degree="4", r="5")
