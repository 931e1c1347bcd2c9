"""Round-4 TPU batch 6: refresh the reference-sweep table under the
zpad-up production default.

The round-4 sweep rows (experiments/r4_batch1/2.py) were measured BEFORE
PMG_ZPAD_UP became the TPU default (commit b9e945b): their coarse r<=4
tails ran on XLA/kron.  The zpad-up coarse tail cut the Q4 r=6 cycle
16.81 -> 16.12 ms and the r=5 sub-cycle 3.72 -> 0.465 ms, and the gain is
proportionally LARGER for the small-DoF rows (Q7 r=5: 11.4M DoF where the
coarse share dominates).  Q2 r=7 sits at 9.96e8 — one coarse-tail shave
from crossing 1e9.

Re-run every non-Q4 sweep row on the production auto path (the default
now includes zpad-up); Q4 rows are already banked post-flip
(experiments/r4_batch4.py).  Run with
PYTHONPATH=/root/repo:/root/.axon_site on the tunneled TPU.
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


run_bench("q2_r7", r="7", degree="2")     # 9.96e8 pre-flip — the 1e9 bid
run_bench("q7_r5", r="5", degree="7")     # smallest DoF count: biggest share
run_bench("q1_r8", r="8", degree="1")
run_bench("q5_r6", r="6", degree="5")
run_bench("q6_r6", r="6", degree="6")
run_bench("q3_r7", r="7", degree="3")
print("batch6 done", flush=True)
