"""Round-5 follow-up: the staged 512k determinism leg that BASELINE.md queued.

Runs ONLY a cross-parallelism staged chain at 512k pages / band_groups=2
(cpus from argv[1], default 16 — the committed timed leg ran local[8], so
any other count is cross-parallelism evidence; 16 beats 4 on wall because
the GEMM stages are memory-bus-bound past ~8 procs while the JVM stages
still speed up) and compares the canonical-edge signature against the
committed timed leg in BENCH_r05_scale.json. Determinism is host-weather-
independent, so this leg can run on a degraded window. Also re-measures the
cands-stage peak tree-RSS: the committed timed leg predates the
sized_partitions fix (linker/lsh.py), so this run doubles as evidence that
the 78 GB packed-top-k stage peak is now bounded.
"""
import json, sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_scale_staged import run_chain

det_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
committed = json.load(open(os.path.join(os.path.dirname(__file__), "..", "BENCH_r05_scale.json")))
want_sig = committed["best"]["signature"]
timed_cpus = committed["best"].get("cpus", committed.get("timed_cpus", 8))
if det_cpus == timed_cpus:
    # a same-parallelism rerun would emit a bit_identical flag that is NOT
    # cross-parallelism evidence — refuse rather than mislabel
    sys.exit(
        f"refusing: det_cpus={det_cpus} equals the committed timed leg's cpu "
        f"count; pass a different count for cross-parallelism evidence"
    )
det = run_chain(512000, det_cpus, "/tmp/scale_staged_det", 2, os.environ.get("SPARK_DRIVER_MEM", "12g"))
out = {
    "metric": "kg_scale_point_staged_determinism",
    "n_pages": 512000,
    "det_cpus": det_cpus,
    "band_groups": 2,
    "committed_signature": want_sig,
    "signature": det["signature"],
    "bit_identical": det["signature"] == want_sig,
    "total_sec": det["total_sec"],
    "peak_stage_rss_gb": det["peak_stage_rss_gb"],
    "stages": det["stages"],
    "note": "post sized_partitions fix; timed leg predates it - cands peak RSS comparison is the fix evidence",
}
with open("/tmp/det_leg_out.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
