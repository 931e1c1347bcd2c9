"""Round-4 TPU batch 1: bank the sweep-table rows VERDICT r3 flagged as
stale or missing (items #3, #5, #6).

(a) Q5 r=6 and Q7 r=5 on the lane-padded (zpad) pallas path — the table
    still shows pre-zpad kron numbers;
(b) Q6 r=6 on the round-3-close mxu3-as-exact rescue (the table row is "—");
(c) Q2 r=7 / Q3 r=7 post-cheb2 (the closest rows to the 1e9 north star);
(d) Q1 r=8 amortized;
(e) q4 r=5 (the r=6 cycle's ENTIRE coarse recursion, for the round-4
    coarse-lever budget).

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


# (a) zpad rows (pre-zpad: Q5 kron 2.3e8, Q7 kron 3.1e8)
run_bench("q5_r6_zpad", degree="5")
run_bench("q7_r5_zpad", degree="7", r="5")

# (b) Q6: the mxu3-as-exact rescue (row was "—"; banded crashes at p=6)
run_bench("q6_r6_mxu3_rescue", degree="6")

# (c) post-cheb2 rows nearest the north star (pre-cheb2: 8.7e8 / 5.2e8)
run_bench("q2_r7_cheb2", degree="2", r="7")
run_bench("q3_r7_cheb2", degree="3", r="7")

# (d) Q1 amortized (Q1 r=7 is fixed-cost-bound at 2.1M DoF)
run_bench("q1_r8_amortized", degree="1", r="8")

# (e) the r=6 cycle's coarse-recursion share == a full r=5-rooted cycle
run_bench("q4_r5_coarse_share", degree="4", r="5")
