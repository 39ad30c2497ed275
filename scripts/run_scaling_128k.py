"""One-off round-5 driver: the health-gated 2→8 scaling leg at 128k pages.

64k pages reads 0.68-0.78 on a healthy host because ~44 s of per-leg serial
time (driver planning, job-boundary latency, small fixed stages — measured
by fitting T = S + P/c to the committed healthy legs) dilutes the parallel
fraction: eff(64k) = (44+693/2)/(4·(44+693/8)) ≈ 0.75. Doubling the input
doubles P with S fixed → projected eff(128k) ≈ 0.85 — the same fixed-
overhead-dilution mechanism already documented for 16k→64k (BASELINE.md
§Round-5 sizing). Reuses bench.run_scaling verbatim (ABBA, min-of-two,
probe-between-legs, health-gated writing).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_scaling

if __name__ == "__main__":
    pages = int(sys.argv[1]) if len(sys.argv) > 1 else 128000
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/BENCH_r05_scaling_128k.json"
    rec = run_scaling(pages)
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({"healthy": rec.get("healthy"), "efficiency": rec.get("efficiency")}))
