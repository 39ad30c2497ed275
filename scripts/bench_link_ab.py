"""Apples-to-apples A/B of the link stage: round-1 code vs current code.

BENCH_r02 recorded link_sec 36.3 s vs round-1's 27.9 s on the same input —
but the r2 run's host probe read ~20% of healthy, so host state is the
prime suspect. This harness isolates CODE from HOST: the SAME
pre-materialized node table feeds the link stage (ann_candidates +
link_nodes) from two source trees — a git worktree at the round-1 commit
and the current repo — in fresh subprocesses, ABBA order, min-of-two per
variant, host GEMM probe recorded before each run.

Usage: python scripts/bench_link_ab.py [n_pages] [cpus] [r1_commit]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_GEN_SNIPPET = """
import sys
sys.path.insert(0, {root!r})
from cortex_spark.corpus import synth_pages
from cortex_spark.extract.fused import pages_to_nodes_fused
from cortex_spark.session import get_spark
spark = get_spark("ab-gen", master="local[{cpus}]", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
pages = synth_pages(spark, {n_pages}, seed=42)
nodes = pages_to_nodes_fused(pages, embed_dim=64)
nodes.write.mode("overwrite").parquet({nodes_path!r})
import json
print(json.dumps({{"nodes": spark.read.parquet({nodes_path!r}).count()}}))
"""

_LINK_SNIPPET = """
import json, sys, time
sys.path.insert(0, {tree!r})
from cortex_spark.linker.pipeline import ann_candidates, link_nodes
from cortex_spark.session import get_spark
spark = get_spark("ab-link", master="local[{cpus}]", shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
nodes = spark.read.parquet({nodes_path!r}).localCheckpoint()
nodes.count()
t0 = time.time()
cands = ann_candidates(nodes).localCheckpoint()
edges = link_nodes(nodes, candidates=cands).localCheckpoint()
n = edges.count()
print(json.dumps({{"link_sec": round(time.time() - t0, 2), "edges": n}}))
"""


def _run(code: str) -> dict:
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                         timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    r1 = sys.argv[3] if len(sys.argv) > 3 else "9e91cec"

    sys.path.insert(0, ROOT)
    from bench import host_probe

    r1_tree = "/tmp/cortex_link_ab_r1"
    if not os.path.isdir(r1_tree):
        subprocess.run(["git", "worktree", "add", "--detach", r1_tree, r1],
                       cwd=ROOT, check=True, capture_output=True)

    nodes_path = "/tmp/cortex_link_ab_nodes.parquet"
    if not os.path.isdir(nodes_path):
        _run(_GEN_SNIPPET.format(root=ROOT, cpus=cpus, n_pages=n_pages,
                                 nodes_path=nodes_path))

    runs: dict[str, list] = {"r1": [], "current": []}
    probes = []
    for variant in ("current", "r1", "r1", "current"):  # ABBA
        probes.append({"variant": variant, "gemms_8": host_probe(8)})
        tree = r1_tree if variant == "r1" else ROOT
        res = _run(_LINK_SNIPPET.format(tree=tree, cpus=cpus, nodes_path=nodes_path))
        runs[variant].append(res)
        time.sleep(30)

    best = {k: min(v, key=lambda r: r["link_sec"]) for k, v in runs.items()}
    print(json.dumps({
        "n_pages": n_pages, "cpus": cpus, "r1_commit": r1,
        "r1": best["r1"], "current": best["current"],
        "all_link_secs": {k: [r["link_sec"] for r in v] for k, v in runs.items()},
        "edges_equal": best["r1"]["edges"] == best["current"]["edges"],
        "speedup_current_vs_r1": round(best["r1"]["link_sec"] / best["current"]["link_sec"], 3),
        "host_probes": probes,
    }))


if __name__ == "__main__":
    main()
